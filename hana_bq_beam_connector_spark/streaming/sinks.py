"""Streaming sinks & built-in streaming dedup.

Two production patterns the window/stateful modules don't cover:

* ``dedup_within_watermark`` — Spark's built-in streaming dedup
  (``dropDuplicatesWithinWatermark``): state for a key is held only
  until the watermark passes it, so an at-least-once upstream (Kafka
  replays, retried micro-batches) becomes effectively-once without
  unbounded state — the built-in alternative to the
  applyInPandasWithState flag machine when dup keys arrive close in
  event time.
* ``foreach_batch_idempotent_append`` — exactly-once file sink: each
  micro-batch writes to a batch-id-keyed subdirectory, so a replayed
  batch (failure between write and checkpoint commit) OVERWRITES its
  own previous attempt instead of appending duplicates.  This is the
  standard idempotent-writer recipe for sinks without transactions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    event_time_col: str = "event_time",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop duplicate ``keys`` arriving within the watermark horizon;
    per-key state is evicted once the watermark passes — bounded
    state under unbounded duplicate streams."""
    return events.withWatermark(event_time_col, watermark)\
        .dropDuplicatesWithinWatermark(keys)


def foreach_batch_idempotent_append(
    stream: DataFrame, base_path: str, checkpoint: str
):
    """Start an availableNow query appending parquet per micro-batch,
    idempotently: batch N always lands in ``{base_path}/batch={N}``
    with overwrite, so replays cannot duplicate rows."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            f"{base_path}/batch={batch_id}"
        )

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
