"""Stream-stream joins (Structured Streaming, SURVEY §2c streaming
extension).

A stream-stream join buffers both sides in the state store until the
watermark proves no more matches can arrive; the join-time bound
(``c_time BETWEEN p_time - gap AND p_time``) is what lets Spark evict
— without it state grows forever.  Same declarative plan runs batch
or streaming, which is how the equivalence test pins semantics.

Scale notes: state is hash-partitioned on the equi-key (user_id), so
a 100 TB/day feed shards across the cluster; watermark delay bounds
per-key state to (watermark + gap) of events.  The interval condition
must be closed-form on event time — "most recent click" (as-of) is
not expressible in append streaming; the batch as-of operator
(operators/relational.asof_join) covers that shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchase_click_interval_join(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Each purchase joined to every click by the same user within the
    preceding ``gap_minutes``.  Works on a static events DataFrame
    (batch oracle) or a streaming one (state-store buffered).

    ``how='left_outer'`` additionally emits click-less purchases with
    NULL click columns.  In streaming, an outer row is held in state
    until the watermark passes its purchase time (only then can Spark
    prove no matching click will arrive); purchases younger than the
    final watermark when the stream ends are never emitted — the
    correct streaming semantics, pinned in
    tests/test_streaming.py::test_stream_stream_left_outer_join.
    """
    p = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("event_time").alias("p_time"),
        F.col("value").alias("purchase_value"),
    )
    c = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("event_time").alias("c_time"),
    )
    if events.isStreaming:
        p = p.withWatermark("p_time", watermark)
        c = c.withWatermark("c_time", watermark)
    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_time") >= F.col("p_time") - F.expr(f"INTERVAL {gap_minutes} MINUTES"))
        & (F.col("c_time") <= F.col("p_time"))
    )
    return p.join(c, cond, how).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "click_id",
        "p_time",
        "c_time",
        "purchase_value",
    )


def enrich_with_dim(
    events: DataFrame,
    dim: DataFrame,
    on_left: str = "user_id",
    on_right: str = "c_custkey",
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: every micro-batch hash-joins
    against the static dimension with the dim side broadcast —
    stateless (no state store, no watermark needed; only stream-stream
    joins buffer state), so throughput is the scan rate.  The dim
    snapshot is re-resolvable per micro-batch, which is how slowly-
    changing dimensions refresh mid-stream.  Works identically on a
    static events frame (the batch oracle)."""
    return events.join(
        F.broadcast(dim), events[on_left] == dim[on_right], how
    )
