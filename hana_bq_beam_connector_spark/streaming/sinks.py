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


def streaming_dedup_against_corpus(
    doc_stream: DataFrame,
    corpus_df: DataFrame,
    id_col: str,
    text_col: str,
    base_path: str,
    checkpoint: str,
    k: int = 3,
    threshold: float = 0.8,
):
    """Streaming corpus curation: each micro-batch of incoming
    documents is probed against a build-once corpus LSH index
    (operators/dedup.corpus_dedup_index); survivors (no near-dup in
    the corpus) land in a batch-id-keyed directory, so replays
    overwrite their own attempt — effectively-once end to end.

    The index is built and persisted BEFORE the query starts and
    closed over by the foreachBatch callback: per-batch cost is
    O(micro-batch) — shingle the increment, broadcast-probe the band
    index, anti-join — the corpus is never re-shingled or shuffled.
    This is the production shape for continuous ingestion at 100 TB
    corpus scale: the band table lives bucketed on band_hash, and
    accepted batches append their own bands to it downstream.
    """
    from hana_bq_beam_connector_spark.operators.dedup import (
        corpus_dedup_index,
        incremental_near_dup_filter,
    )

    index = corpus_dedup_index(corpus_df, id_col, text_col, k)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        fresh = incremental_near_dup_filter(
            batch_df,
            corpus_df,
            id_col,
            text_col,
            k,
            threshold,
            index=index,
        )
        fresh.write.mode("overwrite").parquet(
            f"{base_path}/batch={batch_id}"
        )

    return (
        doc_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
