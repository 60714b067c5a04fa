"""ETL parity queries (SURVEY §2a R1-R15 — the reference's own surface).

The reference's entire capability is "copy the ``[startTime, ∞)``
window of one table, chunked equi-depth on the timestamp column, with
stringified values" (HanaToBQ.java:246-260).  These queries pin that
behavior against the DuckDB oracle on the ``events`` stand-in table.

``events.ts`` ships as parquet TIMESTAMP(MICROS), isAdjustedToUTC=false
— ``timestamp_ntz`` Spark-side, microsecond TIMESTAMP in DuckDB.  Every
query that *outputs* ts exposes it as epoch microseconds (Spark:
``_util.ts_epoch_us``; DuckDB: ``epoch_us(ts)``) so both sides hash the
same integers; window bounds are typed literals on the raw column
(``_util.events_us``) so the filters still reach PushedFilters.  The
``_util`` dispatch also still understands the two historical layouts
(int64-ns via nanosAsLong, and LTZ) — the engine is drift-proof against
a testdata layout change.  Integer compares throughout — no float
rounding at chunk seams (quirk #3/#4 fixed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hana_bq_beam_connector_spark.queries import register
from hana_bq_beam_connector_spark.sources.files import load_table
from hana_bq_beam_connector_spark.typemap import stringify

# 2024-01-05 / 2024-01-15 / 2024-01-25 00:00:00 UTC in epoch microseconds.
T5_US = 1_704_412_800_000_000
T15_US = 1_705_276_800_000_000
T25_US = 1_706_140_800_000_000

_EVENT_COLS = "event_id, epoch_us(ts) AS ts, user_id, event_type, value, props"


from hana_bq_beam_connector_spark.queries._util import events_us as _events_us_windowed


def _events_us(spark: SparkSession, sf_dir: str, lo=None, hi=None) -> DataFrame:
    """events as epoch-µs with scan-pushed window bounds (see
    queries/_util.events_us)."""
    return _events_us_windowed(spark, sf_dir, lo_us=lo, hi_us=hi)


@register(
    "etl_window_copy",
    f"""
    SELECT {_EVENT_COLS}
    FROM events
    WHERE epoch_us(ts) >= {T5_US} AND epoch_us(ts) < {T15_US}
    """,
    doc="R1/R5: the reference pipeline's copy — half-open [start,end) "
    "window scan of the source table, end_time honored (quirk #2 fixed).",
)
def etl_window_copy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _events_us(spark, sf_dir, lo=T5_US, hi=T15_US)


@register(
    "etl_incremental_highwatermark",
    f"""
    SELECT {_EVENT_COLS}
    FROM events
    WHERE epoch_us(ts) >= {T15_US}
    """,
    doc="R14 start_time semantics: the incremental re-run from the "
    "checkpointed high watermark — [watermark, ∞), the reference's "
    "poor-man's CDC (HanaToBQ.java:206-218) with a real watermark.",
)
def etl_incremental_highwatermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _events_us(spark, sf_dir, lo=T15_US)


@register(
    "etl_stringify_parity",
    f"""
    SELECT
      CAST(event_id AS VARCHAR) AS event_id,
      CAST(epoch_us(ts) AS VARCHAR) AS ts,
      CAST(user_id AS VARCHAR) AS user_id,
      CASE WHEN LOWER(event_type) = 'null' THEN NULL ELSE event_type END
        AS event_type,
      CAST(value AS VARCHAR) AS value,
      CASE WHEN LOWER(props) = 'null' THEN NULL ELSE props END AS props
    FROM events
    WHERE epoch_us(ts) >= {T5_US} AND epoch_us(ts) < {T15_US}
    """,
    doc="R11 parity: every value stringified, strings spelling "
    "'null'/'NULL' dropped to NULL (HanaDBRowToTableRowFn.java:26-35).",
)
def etl_stringify_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stringify(_events_us(spark, sf_dir, lo=T5_US, hi=T15_US))


@register(
    "etl_chunk_plan_exact",
    """
    SELECT rn // 2000 AS chunk_idx, ts
    FROM (
      SELECT epoch_us(ts) AS ts,
             ROW_NUMBER() OVER (ORDER BY epoch_us(ts), event_id) AS rn
      FROM events
    )
    WHERE rn % 2000 = 0
    """,
    doc="R4/R6/R7/R8/R9: the reference's equi-depth boundary sampling "
    "(ROW_NUMBER + MOD every chunkSize-th row, HanaToBQ.java:57) as a "
    "first-class oracle-checked query; production path uses the "
    "approxQuantile sketch planner in plans/chunking.py instead of "
    "this full window sort.",
)
def etl_chunk_plan_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _events_us(spark, sf_dir)
    w = Window.orderBy(F.col("ts"), F.col("event_id"))
    return (
        events.select("ts", F.row_number().over(w).alias("rn"))
        .where(F.pmod(F.col("rn"), F.lit(2000)) == 0)
        .select(
            (F.col("rn") / 2000).cast("long").alias("chunk_idx"), F.col("ts")
        )
    )


@register(
    "etl_merge_upsert",
    """
    WITH updates AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DOUBLE)
          AS o_totalprice,
        o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 7 = 0
    )
    SELECT o.o_orderkey,
      COALESCE(u.o_custkey, o.o_custkey) AS o_custkey,
      COALESCE(u.o_orderstatus, o.o_orderstatus) AS o_orderstatus,
      COALESCE(u.o_totalprice, o.o_totalprice) AS o_totalprice,
      COALESCE(u.o_orderdate, o.o_orderdate) AS o_orderdate,
      COALESCE(u.o_orderpriority, o.o_orderpriority) AS o_orderpriority
    FROM orders o LEFT JOIN updates u ON o.o_orderkey = u.o_orderkey
    """,
    doc="Merge/upsert (the APPEND-only reference cannot express "
    "updates, HanaToBQ.java:256-259): updated snapshot rows replace "
    "same-key rows, everything else survives — one full-outer hash "
    "join + struct coalesce; with a bucketed existing side only the "
    "update snapshot shuffles.",
)
def etl_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hana_bq_beam_connector_spark.plans.upsert import merge_upsert

    o = load_table(spark, sf_dir, "orders")
    updates = o.where(F.col("o_orderkey") % 7 == 0).withColumn(
        "o_totalprice",
        (F.col("o_totalprice").cast("decimal(18,2)") * 2).cast("double"),
    )
    return merge_upsert(o, updates.select(*o.columns), key="o_orderkey")


@register(
    "etl_scd2_history",
    """
    SELECT user_id, event_id,
           epoch_us(ts) AS valid_from_us,
           LEAD(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts), event_id
           ) AS valid_to_us,
           LEAD(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts), event_id
           ) IS NULL AS is_current,
           value
    FROM events WHERE event_type = 'purchase'
    """,
    doc="SCD type-2 history build from a change log: each change row "
    "becomes a [valid_from, valid_to) validity interval via LEAD, the "
    "open row flagged current — the standard dimension-versioning "
    "transform an append-only copy tool (the reference) cannot "
    "express.  One hash shuffle on the business key; ties broken by "
    "event_id so versions are total-ordered.",
)
def etl_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_us_windowed(spark, sf_dir).where(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        F.col("ts").alias("valid_from_us"),
        nxt.alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
        "value",
    )
