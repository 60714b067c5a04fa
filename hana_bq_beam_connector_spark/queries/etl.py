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


@register(
    "etl_snapshot_diff",
    """
    WITH olds AS (
      SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderkey % 5 <> 0
    ),
    news AS (
      SELECT o_orderkey,
        CASE WHEN o_orderkey % 7 = 0 THEN 'RUSH' ELSE o_orderpriority END
          AS o_orderpriority
      FROM orders WHERE o_orderkey % 3 <> 0
    )
    SELECT COALESCE(olds.o_orderkey, news.o_orderkey) AS o_orderkey,
      CASE WHEN olds.o_orderkey IS NULL THEN 'added'
           WHEN news.o_orderkey IS NULL THEN 'removed'
           ELSE 'changed' END AS change_type,
      olds.o_orderpriority AS old_o_orderpriority,
      news.o_orderpriority AS new_o_orderpriority
    FROM olds FULL JOIN news ON olds.o_orderkey = news.o_orderkey
    WHERE olds.o_orderkey IS NULL OR news.o_orderkey IS NULL
       OR olds.o_orderpriority <> news.o_orderpriority
    """,
    doc="Snapshot diff (table-level CDC audit): two snapshots of the "
    "same keyed table reduce to added/removed/changed rows via one "
    "co-partitioned full-outer hash join — the audit the APPEND-only "
    "reference (HanaToBQ.java:256-259) cannot express.  Both sides "
    "shuffle once on the key; on bucketed layouts "
    "(sinks_bucketed.py) the exchange disappears entirely.  Unchanged "
    "rows are dropped post-join so only the (small) delta survives "
    "the operator — at 100 TB the output is the changed sliver, never "
    "a second copy of the table.",
)
def etl_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hana_bq_beam_connector_spark.plans.diff import snapshot_diff

    o = load_table(spark, sf_dir, "orders")
    old = o.where(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey", "o_orderpriority"
    )
    new = o.where(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("RUSH"))
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
    )
    return snapshot_diff(old, new, key="o_orderkey", compare=["o_orderpriority"])


@register(
    "etl_cdc_apply",
    """
    SELECT o_orderkey,
      CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END
        AS o_orderstatus
    FROM orders WHERE o_orderkey % 11 <> 0
    UNION ALL
    SELECT o_orderkey + 3000000 AS o_orderkey, 'N' AS o_orderstatus
    FROM orders WHERE o_orderkey % 13 = 0
    """,
    doc="CDC apply with tombstones: one change batch of "
    "inserts/updates/deletes folds into the base snapshot — deletes "
    "as an anti-join (keys leave, no payload moves), upserts via the "
    "staged merge (plans/cdc.apply_cdc).  Deletes take precedence "
    "over updates on the same key.  The whole apply is anti-join + "
    "union on the key: one co-partitioned shuffle of the (small) "
    "change batch against the base, zero with bucketed layouts — the "
    "missing half of the reference's append-only 'CDC' "
    "(HanaToBQ.java:206-218).",
)
def etl_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hana_bq_beam_connector_spark.plans.cdc import apply_cdc

    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    key = F.col("o_orderkey")
    deletes = base.where(key % 11 == 0).select(
        "o_orderkey", F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit("D").alias("op"),
    )
    updates = base.where(key % 7 == 0).select(
        "o_orderkey", F.lit("X").alias("o_orderstatus"), F.lit("U").alias("op")
    )
    inserts = base.where(key % 13 == 0).select(
        (key + 3000000).alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"),
        F.lit("I").alias("op"),
    )
    changes = deletes.unionByName(updates).unionByName(inserts)
    return apply_cdc(base, changes, key="o_orderkey", op_col="op")


@register(
    "etl_scd2_pit_join",
    """
    WITH hist AS (
      SELECT user_id, epoch_us(ts) AS vf,
             LEAD(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS vt,
             value
      FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id, c.ts_us,
           h.vf AS version_from_us, h.value AS version_value
    FROM clicks c JOIN hist h
      ON c.user_id = h.user_id
     AND h.vf <= c.ts_us AND (h.vt IS NULL OR c.ts_us < h.vt)
    """,
    doc="Point-in-time join of facts to an SCD2 dimension: each click "
    "picks the purchase-history version whose [valid_from, valid_to) "
    "interval contains the click time — the temporal-correctness join "
    "every feature-store / training-data build needs (joining "
    "today's dimension row into yesterday's fact leaks the future).  "
    "Co-partitioned on the business key: one hash exchange per side, "
    "the interval predicate filters inside the per-key sort-merge — "
    "versions tile time, so each fact matches at most one row and "
    "fan-out is exactly 1.  Zero-width versions (same-timestamp "
    "updates) match nothing; the final same-timestamp version wins — "
    "the deterministic tiling LEAD(ts, event_id) defines.",
)
def etl_scd2_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_us_windowed(spark, sf_dir)
    hist_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hist = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("h_user"),
            F.col("ts").alias("vf"),
            F.lead("ts").over(hist_w).alias("vt"),
            F.col("value").alias("version_value"),
        )
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("ts_us")
    )
    cond = (
        (clicks["user_id"] == hist["h_user"])
        & (hist["vf"] <= clicks["ts_us"])
        & (hist["vt"].isNull() | (clicks["ts_us"] < hist["vt"]))
    )
    return clicks.join(hist, cond).select(
        "event_id",
        "user_id",
        "ts_us",
        F.col("vf").alias("version_from_us"),
        "version_value",
    )


@register(
    "etl_backfill_plan",
    f"""
    WITH src_days AS (
      SELECT DISTINCT epoch_us(ts) - epoch_us(ts) % {86_400_000_000}
        AS day_us
      FROM events
    ),
    missing AS (
      SELECT day_us FROM src_days
      WHERE NOT (day_us < {T15_US}
                 OR (day_us // {86_400_000_000}) % 7 = 3)
    ),
    ranked AS (
      SELECT day_us,
             day_us - ROW_NUMBER() OVER (ORDER BY day_us)
               * {86_400_000_000} AS island
      FROM missing
    )
    SELECT MIN(day_us) AS range_start_us,
           MAX(day_us) + {86_400_000_000} AS range_end_us,
           CAST(COUNT(*) AS BIGINT) AS n_days
    FROM ranked GROUP BY island
    """,
    doc="Backfill planner: diff the source's populated days against "
    "the sink's copied days (simulated here: everything before T15 "
    "plus every 7th day is already copied) and fold the missing days "
    "into contiguous half-open [start, end) backfill ranges via the "
    "gaps-and-islands day - rank*DAY trick — the driver-side planning "
    "step that turns 'what's missing' into chunked copy windows for "
    "the reference pipeline (each range feeds equi_depth_intervals).  "
    "Day-distinct reduces events to O(days) rows before any window, "
    "so the island sort is over a tiny domain at any corpus size.",
)
def etl_backfill_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    day_us = 86_400_000_000
    ev = _events_us_windowed(spark, sf_dir)
    src_days = ev.select(
        (F.col("ts") - F.col("ts") % day_us).alias("day_us")
    ).distinct()
    missing = src_days.where(
        ~(
            (F.col("day_us") < T15_US)
            | (F.floor(F.col("day_us") / day_us) % 7 == 3)
        )
    )
    rn = F.row_number().over(Window.orderBy("day_us"))
    ranked = missing.select(
        "day_us", (F.col("day_us") - rn * day_us).alias("island")
    )
    return ranked.groupBy("island").agg(
        F.min("day_us").alias("range_start_us"),
        (F.max("day_us") + day_us).alias("range_end_us"),
        F.count(F.lit(1)).alias("n_days"),
    ).drop("island")


@register(
    "etl_copy_reconciliation",
    """
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS chunk_year,
           CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS chunk_month,
           COUNT(*) AS n_rows,
           BIT_XOR(o_orderkey) AS key_xor,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS price_sum
    FROM orders
    GROUP BY chunk_year, chunk_month
    """,
    doc="Copy-validation fingerprints, the missing half of the "
    "reference's pipeline: after a chunked HANA->BigQuery copy "
    "(HanaToBQ.java:247-259) nothing verifies the sink matches the "
    "source.  This emits per-chunk (month) fingerprints — row count, "
    "order-insensitive XOR and sum of the key, exact-decimal measure "
    "sum — computed identically on either side of a copy; a full-outer "
    "join of the two fingerprint tables pinpoints the exact chunks to "
    "re-copy (feeding the backfill planner).  All aggregates are "
    "partial-agg friendly (map-side combined) and order-insensitive "
    "by construction, so the fingerprint is layout-independent: ONE "
    "shuffle of ~per-month partials regardless of table size.",
)
def etl_copy_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").cast("bigint").alias("chunk_year"),
        F.month("o_orderdate").cast("bigint").alias("chunk_month"),
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(o_orderkey)").alias("key_xor"),
        F.sum("o_orderkey").cast("bigint").alias("key_sum"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("price_sum"),
    )


@register(
    "etl_reconcile_verdicts",
    """
    WITH src AS (
      SELECT (epoch_us(o_orderdate)
              - ((epoch_us(o_orderdate) % 86400000000) + 86400000000)
                % 86400000000) AS bucket_lo,
             COUNT(*) AS src_rows,
             BIT_XOR(o_orderkey) AS src_xor,
             CAST(SUM(o_orderkey) AS BIGINT) AS src_sum
      FROM orders GROUP BY bucket_lo
    ),
    snk AS (
      SELECT (epoch_us(o_orderdate)
              - ((epoch_us(o_orderdate) % 86400000000) + 86400000000)
                % 86400000000) AS bucket_lo,
             COUNT(*) AS sink_rows,
             BIT_XOR(o_orderkey) AS sink_xor,
             CAST(SUM(o_orderkey) AS BIGINT) AS sink_sum
      FROM orders WHERE o_orderkey % 50 <> 0 GROUP BY bucket_lo
    )
    SELECT COALESCE(src.bucket_lo, snk.bucket_lo) AS bucket_lo,
           CASE WHEN snk.sink_rows IS NULL THEN 'missing_in_sink'
                WHEN src.src_rows IS NULL THEN 'extra_in_sink'
                WHEN src.src_rows = snk.sink_rows
                     AND src.src_xor = snk.sink_xor
                     AND src.src_sum = snk.sink_sum THEN 'ok'
                ELSE 'mismatch' END AS status,
           src.src_rows, snk.sink_rows
    FROM src FULL OUTER JOIN snk ON src.bucket_lo = snk.bucket_lo
    """,
    doc="Copy-reconciliation verdicts under the oracle gate: the sink "
    "simulates a lossy copy (every 50th key dropped), and "
    "plans/reconcile.reconcile_chunks must classify every day bucket "
    "as ok / mismatch / missing exactly as the SQL replay does — "
    "this puts the CLI --reconcile operator itself (fingerprint "
    "aggregates, floor bucketing, full-outer verdict logic) under "
    "the driver's value-hash check, not just unit tests.  Two "
    "map-side-combined fingerprint aggregates + an O(buckets) join.",
)
def etl_reconcile_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hana_bq_beam_connector_spark.plans.reconcile import (
        reconcile_chunks,
    )

    o = load_table(spark, sf_dir, "orders")
    sink = o.where(F.col("o_orderkey") % 50 != 0)
    return reconcile_chunks(o, sink, "o_orderdate", "o_orderkey")


@register(
    "etl_reconcile_payload_verdicts",
    """
    SELECT (epoch_us(o_orderdate)
            - ((epoch_us(o_orderdate) % 86400000000) + 86400000000)
              % 86400000000) AS bucket_lo,
           CASE WHEN SUM(CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END)
                     > 0
                THEN 'mismatch' ELSE 'ok' END AS status,
           COUNT(*) AS src_rows,
           COUNT(*) AS sink_rows
    FROM orders GROUP BY bucket_lo
    """,
    doc="Payload-corruption reconciliation under the oracle gate: the "
    "sink keeps every key, count and timestamp but mangles a STRING "
    "column on every 97th key (the classic encoding-corrupts-text "
    "copy failure, invisible to count/key fingerprints).  The "
    "canonicalized full-row xxhash64 XOR (plans/reconcile.row_hash) "
    "must flag exactly the buckets containing a corrupted row as "
    "'mismatch' — the DuckDB replay derives the same verdict from the "
    "corruption predicate itself.  Still one map-side-combined "
    "aggregate per side; the row hash widens the shuffle by one "
    "bigint per bucket, not per row.",
)
def etl_reconcile_payload_verdicts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from hana_bq_beam_connector_spark.plans.reconcile import (
        reconcile_chunks,
    )

    o = load_table(spark, sf_dir, "orders")
    sink = o.withColumn(
        "o_orderpriority",
        F.when(
            F.col("o_orderkey") % 97 == 0,
            F.concat(F.col("o_orderpriority"), F.lit("?")),
        ).otherwise(F.col("o_orderpriority")),
    )
    return reconcile_chunks(o, sink, "o_orderdate", "o_orderkey")


@register(
    "etl_reconcile_measure_verdicts",
    """
    SELECT (epoch_us(o_orderdate)
            - ((epoch_us(o_orderdate) % 86400000000) + 86400000000)
              % 86400000000) AS bucket_lo,
           CASE WHEN SUM(CASE WHEN o_orderkey % 89 = 0 THEN 1 ELSE 0 END)
                     > 0
                THEN 'mismatch' ELSE 'ok' END AS status,
           COUNT(*) AS src_rows,
           COUNT(*) AS sink_rows
    FROM orders GROUP BY bucket_lo
    """,
    doc="Measure-sum reconciliation in keys-only mode (the shape for "
    "stringified or re-typed copies where the full-row hash cannot "
    "apply): every 89th key's o_totalprice is shifted by +1 cent in "
    "the sink; counts and key XOR/sum still match, so ONLY the "
    "exact-decimal measure sum (doubles rounded at 6 dp by the "
    "decimal cast — deterministic and order-insensitive, unlike "
    "native double summation) separates 'ok' from 'mismatch'.  The "
    "DuckDB replay derives verdicts from the corruption predicate.",
)
def etl_reconcile_measure_verdicts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from hana_bq_beam_connector_spark.plans.reconcile import (
        reconcile_chunks,
    )

    o = load_table(spark, sf_dir, "orders")
    sink = o.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") + 0.01
        ).otherwise(F.col("o_totalprice")),
    )
    return reconcile_chunks(
        o,
        sink,
        "o_orderdate",
        "o_orderkey",
        measure_cols=["o_totalprice"],
        full_row=False,
    )


# pre/post split for the incremental-maintenance demo: 2024-01-15 UTC
# in epoch µs (the experimentation family's boundary, reused so the
# corpus halves are familiar).
_MAINT_SPLIT_US = 1_705_276_800_000_000


@register(
    "etl_incremental_agg_maintenance",
    """
    SELECT event_type,
      CAST(COUNT(*) AS BIGINT) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT)
        AS total_cents
    FROM events GROUP BY event_type
    """,
    doc="Incremental aggregate (materialized-view) maintenance, "
    "proven against recompute INSIDE the correctness gate: the Spark "
    "side maintains a per-event_type state table from history "
    "(ts < 2024-01-15) and folds in the increment (ts >= split) via "
    "union + re-aggregate — counts and exact DECIMAL cent sums are "
    "commutative monoids, so state ⊕ delta must equal the oracle's "
    "full recompute bit-for-bit, and the driver's hash comparison IS "
    "that proof.  100 TB story: a daily pipeline pays O(increment) "
    "to refresh the aggregate — the 100 TB history is never "
    "re-scanned — and the same fold maintains the view under "
    "late-arriving partitions (re-run the affected delta, identical "
    "algebra).  Both phases are map-side-combinable hash aggregates; "
    "the merge shuffles O(event_types) rows.",
)
def etl_incremental_agg_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _events_us_windowed(spark, sf_dir).select(
        "ts",
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("v"),
    )

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("v") * 100)
            .cast("decimal(38,0)")
            .alias("cents"),
        )

    # The split must PARTITION the table: a NULL event-time satisfies
    # neither `<` nor `>=`, so it would vanish from BOTH branches and
    # break the state ⊕ delta ≡ recompute invariant this query exists
    # to prove.  Untimestamped rows belong to the increment (they
    # arrive "now", after the state was cut).
    state = agg(ev.where(F.col("ts") < _MAINT_SPLIT_US))
    delta = agg(
        ev.where(
            (F.col("ts") >= _MAINT_SPLIT_US) | F.col("ts").isNull()
        )
    )
    merged = (
        state.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("cents").cast("bigint").alias("total_cents"),
        )
    )
    return merged
