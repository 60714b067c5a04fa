"""Structured Streaming windows (SURVEY §2c streaming [X], M4).

The live counterparts of queries/streaming.py's batch-checkable
windows: ``readStream`` sources, event-time watermarks, tumbling /
sliding / session windows.  The aggregation builders take either a
batch or a streaming DataFrame — Structured Streaming's contract is
exactly that the same declarative plan runs incrementally — which is
how tests equivalence-check the streaming path against the batch
oracle-verified results.

Scale notes: stateful aggs shuffle on the grouping key; the watermark
bounds state size (windows older than watermark are finalized and
evicted), which is what makes an unbounded 100 TB/day event feed
feasible.  Use ``spark.sql.shuffle.partitions`` sized to the state
store; sessions use session_window's native state merging.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

# readStream requires a declared schema; this pins the CURRENT events
# layout (ts = parquet TIMESTAMP(MICROS) NTZ).  Unlike the batch path
# (queries/_util dispatches per-dtype across historical layouts), the
# streaming surface supports only this layout by design — a layout
# change should break loudly here, not silently produce shifted
# event times.  tests/test_streaming.py proves the downstream plans
# are layout-agnostic given a correct event_time.
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampNTZType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over an events-shaped parquet directory.

    ``maxFilesPerTrigger`` keeps micro-batches bounded on backfills;
    the NTZ event-time column is cast to an instant (session tz is
    UTC in our session factory) for watermarking."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
        .withColumn("event_time", F.col("ts").cast("timestamp"))
    )


def tumbling_agg(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1h windows per event_type with late-data eviction."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", "1 hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_agg(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Sliding 1h windows every 30m (each event in 2 windows)."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", "1 hour", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


def session_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user: native session_window state merging."""
    return (
        events.withWatermark("event_time", "1 hour")
        .groupBy(F.session_window("event_time", gap), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def run_available_now(
    agg: DataFrame, name: str, checkpoint: str, mode: str = "complete"
) -> None:
    """Drain all available input through the streaming plan into an
    in-memory table ``name`` (availableNow trigger), then stop —
    the batch-equivalence harness for streaming tests."""
    query = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def drift_cells_agg(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Tumbling 6h cell counts per event_type — the ONE stateful
    operator of the live drift monitor (queries/streaming.py
    ``stream_drift_baseline`` is its batch replay).

    The monitor's shares are read-time math over the maintained cell
    table: chaining a second windowed aggregate (window totals) and
    joining two aggregated streams is not a supported streaming
    shape, and the production pattern is exactly this split anyway —
    incremental state holds the O(windows x types) counts, the
    serving layer divides.  tests/test_streaming.py proves the
    composition equals the batch query bit-for-bit."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", "6 hours"), F.col("event_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
        )
    )


# Arm assignment of the experimentation family — keep in sync with
# queries/experiment.py (_KNUTH / _SPARK_ARM); duplicated as a literal
# here because importing the queries package from the streaming layer
# would cycle through queries.__init__._load_all.  A consistency test
# (tests/test_streaming.py) asserts the two expressions agree.
# Guarded like every other envelope in the repo: user_id past
# (2^63-1) DIV 2654435761 would wrap the product in a non-ANSI
# session (negative remainder => always 'treatment'), so a named
# raise_error preempts it.
_ARM_EXPR = (
    "CASE WHEN ((CASE WHEN user_id > 3474701543L OR "
    "user_id < -3474701543L THEN raise_error("
    "'experiment arm hash: |user_id| * 2654435761 exceeds int64 "
    "(|user_id| <= 3474701543); rehash ids (e.g. xxhash64) before "
    "arm assignment') ELSE user_id END) * 2654435761L) % 100 < 50 "
    "THEN 'treatment' ELSE 'control' END"
)


def srm_cells_agg(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Tumbling 6h event counts per experiment arm — the ONE stateful
    operator of the live sample-ratio-mismatch monitor
    (queries/streaming.py ``stream_srm_monitor`` is its batch
    replay).  The chi-square readout is read-time math over this
    maintained O(windows x arms) cell table, same split as the drift
    monitor: incremental state holds exact counts, the serving layer
    does the one-row arithmetic."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(
            F.window("event_time", "6 hours"),
            F.expr(_ARM_EXPR).alias("arm"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            "arm",
            "n",
        )
    )
