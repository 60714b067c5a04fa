"""Event-time windowing queries, batch-checkable (SURVEY §2c
streaming [X]).

These run the *same event-time semantics* Structured Streaming
executes incrementally — tumbling / sliding / session windows and
late-data accounting — expressed over the static events table so the
DuckDB oracle can replay them.  Window boundaries are pure integer
arithmetic on epoch-microsecond timestamps (no engine time-bucket
functions, whose epoch alignment conventions differ).  The live
``readStream`` versions of the same windows live in
``streaming/windows.py`` and are equivalence-tested against these in
tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hana_bq_beam_connector_spark.queries import register
from hana_bq_beam_connector_spark.queries._util import dec, events_us

HOUR_US = 3_600_000_000
HALF_HOUR_US = 1_800_000_000
SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


@register(
    "stream_tumbling_1h",
    f"""
    SELECT (epoch_us(ts) // {HOUR_US}) * {HOUR_US} AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling 1h event-time windows per event_type — the batch "
    "replay of readStream.groupBy(window('1 hour')): one partial-agg "
    "shuffle keyed on (window, type).",
)
def stream_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_us(spark, sf_dir)
    return (
        ev.withColumn(
            "window_start",
            F.expr(f"(ts div {HOUR_US}) * {HOUR_US}"),
        )
        .groupBy("window_start", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
    )


@register(
    "stream_sliding_1h_30m",
    f"""
    SELECT ws AS window_start, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM (
      SELECT value,
        unnest([
          (epoch_us(ts) // {HALF_HOUR_US}) * {HALF_HOUR_US},
          (epoch_us(ts) // {HALF_HOUR_US} - 1) * {HALF_HOUR_US}
        ]) AS ws
      FROM events
    )
    GROUP BY ws
    """,
    doc="Sliding 1h windows every 30m: each event replicates into the "
    "2 windows containing it (slide-count replication, exactly what "
    "Spark's window('1 hour','30 minutes') expands to).",
)
def stream_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_us(spark, sf_dir)
    return (
        ev.select(
            "value",
            F.explode(
                F.array(
                    F.expr(f"(ts div {HALF_HOUR_US}) * {HALF_HOUR_US}"),
                    F.expr(f"(ts div {HALF_HOUR_US} - 1) * {HALF_HOUR_US}"),
                )
            ).alias("window_start"),
        )
        .groupBy("window_start")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
    )


@register(
    "stream_session_windows",
    f"""
    WITH ordered AS (
      SELECT user_id, epoch_us(ts) AS ts, event_id, value,
        CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                  > {SESSION_GAP_US}
             OR LAG(epoch_us(ts)) OVER w IS NULL
             THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    sessions AS (
      SELECT *, SUM(new_session) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS session_id
      FROM ordered
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
    doc="Session windows (30 min inactivity gap) via gaps-and-islands: "
    "lag -> new-session flag -> running sum = session id — the batch "
    "replay of session_window(ts, '30 minutes'); one shuffle on "
    "user_id, linear in-partition scan.",
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_us(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            (F.col("ts") - F.lag("ts").over(w) > SESSION_GAP_US)
            | F.lag("ts").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    wsum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = flagged.withColumn(
        "session_id", F.sum("new_session").over(wsum)
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value")).cast("double").alias("total_value"),
    )


@register(
    "stream_late_events",
    f"""
    WITH wm AS (SELECT MAX(epoch_us(ts)) - {HOUR_US} AS watermark
                FROM events)
    SELECT event_type,
           COUNT(*) AS n_late,
           MIN(epoch_us(ts)) AS earliest_late_ts
    FROM events, wm
    WHERE epoch_us(ts) < wm.watermark
      AND (epoch_us(ts) // {HOUR_US}) * {HOUR_US} + {HOUR_US}
          <= wm.watermark
    GROUP BY event_type
    """,
    doc="Late-data accounting: events whose 1h window fully precedes "
    "the final watermark (max event time - 1h) — the rows a "
    "withWatermark('1 hour') stream would have finalized/dropped.",
)
def stream_late_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_us(spark, sf_dir)
    wm = ev.agg((F.max("ts") - HOUR_US).alias("watermark"))
    return (
        ev.crossJoin(F.broadcast(wm))
        .where(
            (F.col("ts") < F.col("watermark"))
            & (
                F.expr(f"(ts div {HOUR_US}) * {HOUR_US} + {HOUR_US}")
                <= F.col("watermark")
            )
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_late"),
            F.min("ts").alias("earliest_late_ts"),
        )
    )


@register(
    "stream_stateful_distinct_users",
    "SELECT DISTINCT user_id FROM events",
    doc="Custom stateful operator (applyInPandasWithState): streaming "
    "dedup emitting each user_id exactly once at first sight — a real "
    "readStream drained availableNow, so the oracle checks the full "
    "per-key state machine, not a batch stand-in.  State is one flag "
    "per key in the executor state store (bytes/key at 10^9 keys).",
)
def stream_stateful_distinct_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import tempfile
    import uuid

    from hana_bq_beam_connector_spark.streaming.stateful import (
        stateful_distinct_keys,
    )
    from hana_bq_beam_connector_spark.streaming.windows import (
        events_stream,
        run_available_now,
    )

    # the file stream source wants a directory; stage the table there
    src_dir = tempfile.mkdtemp(prefix="sg_stream_src_")
    os.symlink(f"{sf_dir}/events.parquet", f"{src_dir}/events.parquet")
    name = f"distinct_users_{uuid.uuid4().hex[:8]}"
    stream = events_stream(spark, src_dir)
    run_available_now(
        stateful_distinct_keys(stream),
        name,
        tempfile.mkdtemp(prefix="sg_ckpt_"),
        mode="append",
    )
    return spark.table(name)


@register(
    "stream_interval_join_live",
    f"""
    SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
           epoch_us(p.ts) AS p_time_us, epoch_us(c.ts) AS c_time_us,
           p.value AS purchase_value
    FROM events p
    JOIN events c
      ON p.user_id = c.user_id
     AND epoch_us(c.ts) >= epoch_us(p.ts) - {30 * 60 * 1_000_000}
     AND epoch_us(c.ts) <= epoch_us(p.ts)
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    """,
    doc="Live stream-stream interval join (purchases x clicks within "
    "30 min, same user): both sides buffered in the watermarked state "
    "store, drained availableNow — the oracle replays the identical "
    "closed-form time bound in batch SQL.",
)
def stream_interval_join_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile
    import uuid

    from hana_bq_beam_connector_spark.streaming.joins import (
        purchase_click_interval_join,
    )
    from hana_bq_beam_connector_spark.streaming.windows import (
        events_stream,
        run_available_now,
    )

    src_dir = tempfile.mkdtemp(prefix="sg_stream_src_")
    os.symlink(f"{sf_dir}/events.parquet", f"{src_dir}/events.parquet")
    name = f"ss_join_{uuid.uuid4().hex[:8]}"
    joined = purchase_click_interval_join(events_stream(spark, src_dir))
    run_available_now(
        joined, name, tempfile.mkdtemp(prefix="sg_ckpt_"), mode="append"
    )
    return spark.table(name).select(
        "user_id",
        "purchase_id",
        "click_id",
        F.unix_micros("p_time").alias("p_time_us"),
        F.unix_micros("c_time").alias("c_time_us"),
        "purchase_value",
    )


@register(
    "stream_static_enrich",
    """
    SELECT e.event_id, e.user_id, c.c_mktsegment AS segment,
           n.n_name AS nation, e.value
    FROM events e
    LEFT JOIN customer c ON e.user_id = c.c_custkey
    LEFT JOIN nation n   ON c.c_nationkey = n.n_nationkey
    """,
    doc="Stream-static enrichment: events joined to the customer->"
    "nation dim chain.  In streaming this is a stateless per-micro-"
    "batch broadcast join (no state store — only stream-stream joins "
    "buffer); in batch the identical plan.  At 100 TB/day the dim "
    "chain stays MBs-GBs and broadcasts; the fact side never "
    "shuffles.  Live readStream equivalence is tested in "
    "tests/test_streaming.py.",
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hana_bq_beam_connector_spark.sources.files import load_table
    from hana_bq_beam_connector_spark.streaming.joins import enrich_with_dim

    ev = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    dim = c.join(
        F.broadcast(n), c["c_nationkey"] == n["n_nationkey"], "left"
    ).select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.col("n_name").alias("nation"),
    )
    return enrich_with_dim(ev, dim).select(
        "event_id", "user_id", "segment", "nation", "value"
    )


_SIX_H_US = 6 * HOUR_US


@register(
    "stream_drift_baseline",
    f"""
    WITH w AS (
      SELECT (epoch_us(ts) // {_SIX_H_US}) * {_SIX_H_US} AS window_start,
             event_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    wt AS (SELECT window_start, CAST(SUM(n) AS BIGINT) AS win_n
           FROM w GROUP BY 1),
    base AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS base_n
             FROM w GROUP BY 1),
    g AS (SELECT CAST(SUM(n) AS BIGINT) AS all_n FROM w)
    SELECT w.window_start, w.event_type, w.n, wt.win_n,
      CAST(w.n AS DOUBLE) / CAST(wt.win_n AS DOUBLE) AS p_window,
      CAST(base.base_n AS DOUBLE) / CAST(g.all_n AS DOUBLE) AS p_baseline,
      ABS(CAST(w.n AS DOUBLE) / CAST(wt.win_n AS DOUBLE)
          - CAST(base.base_n AS DOUBLE) / CAST(g.all_n AS DOUBLE))
        AS abs_diff
    FROM w
    JOIN wt ON w.window_start = wt.window_start
    JOIN base ON w.event_type = base.event_type
    CROSS JOIN g
    """,
    doc="Windowed drift monitor — the streaming face of the drift "
    "family (queries/drift.py): per tumbling 6h window, each event "
    "type's in-window share vs its corpus-baseline share, with "
    "|p_window - p_baseline| as the per-cell drift signal.  Batch "
    "replay of the LIVE monitor (streaming/windows.drift_cells_agg "
    "maintains the cell counts incrementally; shares are read-time "
    "math over that tiny table — equivalence-tested end to end in "
    "tests/test_streaming.py, same doubles).  All counts exact "
    "BIGINT; shares are single IEEE divisions of exact operands, so "
    "the emission is deterministic at any scale (the same unbounded "
    "per-cell-ratio stance as drift_tvd_price_bands).  One fact "
    "aggregate to the O(windows x types) frame; every join after it "
    "runs on that frame (baseline and 1-row grand total broadcast — "
    "allowlisted).",
)
def stream_drift_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_us(spark, sf_dir)
    w = (
        ev.withColumn(
            "window_start", F.expr(f"(ts div {_SIX_H_US}) * {_SIX_H_US}")
        )
        .groupBy("window_start", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    wt = w.groupBy("window_start").agg(
        F.sum("n").cast("bigint").alias("win_n")
    )
    base = w.groupBy("event_type").agg(
        F.sum("n").cast("bigint").alias("base_n")
    )
    g = w.agg(F.sum("n").cast("bigint").alias("all_n"))
    diff = (
        "ABS(CAST(n AS DOUBLE) / CAST(win_n AS DOUBLE)"
        " - CAST(base_n AS DOUBLE) / CAST(all_n AS DOUBLE))"
    )
    return (
        w.join(wt, "window_start")
        .join(F.broadcast(base), "event_type")
        .crossJoin(F.broadcast(g))
        .select(
            "window_start",
            "event_type",
            "n",
            "win_n",
            F.expr("CAST(n AS DOUBLE) / CAST(win_n AS DOUBLE)").alias(
                "p_window"
            ),
            F.expr(
                "CAST(base_n AS DOUBLE) / CAST(all_n AS DOUBLE)"
            ).alias("p_baseline"),
            F.expr(diff).alias("abs_diff"),
        )
    )


@register(
    "stream_srm_monitor",
    f"""
    WITH c AS (
      SELECT (epoch_us(ts) // {_SIX_H_US}) * {_SIX_H_US} AS window_start,
        CAST(SUM(CASE WHEN (user_id * 2654435761) % 100 < 50
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
        CAST(SUM(CASE WHEN (user_id * 2654435761) % 100 < 50
                 THEN 0 ELSE 1 END) AS BIGINT) AS n_c
      FROM events GROUP BY 1
    )
    SELECT window_start, n_t, n_c,
      CAST(n_t + n_c AS BIGINT) AS n_total,
      CAST(n_t + n_c AS DOUBLE) / 2 AS expected,
      (CAST(n_t AS DOUBLE) - CAST(n_t + n_c AS DOUBLE) / 2)
        * (CAST(n_t AS DOUBLE) - CAST(n_t + n_c AS DOUBLE) / 2)
        / (CAST(n_t + n_c AS DOUBLE) / 2)
      + (CAST(n_c AS DOUBLE) - CAST(n_t + n_c AS DOUBLE) / 2)
        * (CAST(n_c AS DOUBLE) - CAST(n_t + n_c AS DOUBLE) / 2)
        / (CAST(n_t + n_c AS DOUBLE) / 2) AS srm_chi2
    FROM c
    """,
    doc="Windowed sample-ratio-mismatch monitor — the streaming face "
    "of the experimentation family: per tumbling 6h window, exposure "
    "counts per arm and the chi-square statistic against the "
    "designed 50/50 split (a firing window means the traffic split "
    "broke MID-experiment — the alarm that must page before the "
    "readout is polluted, which is why it runs on the stream, not in "
    "the end-of-experiment analysis).  Batch replay of the LIVE "
    "monitor (streaming/windows.srm_cells_agg maintains the "
    "O(windows x arms) exact counts incrementally; the statistic is "
    "read-time arithmetic — live-equivalence-tested in "
    "tests/test_streaming.py, same doubles).  ONE CASE-split "
    "aggregate per window; the chi2 is a fixed-order two-term IEEE "
    "expression of exact integers.",
)
def stream_srm_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hana_bq_beam_connector_spark.queries.experiment import (
        _SPARK_ARM,
    )

    ev = events_us(spark, sf_dir)
    is_t = F.expr(_SPARK_ARM) == "treatment"
    c = ev.withColumn(
        "window_start", F.expr(f"(ts div {_SIX_H_US}) * {_SIX_H_US}")
    ).groupBy("window_start").agg(
        F.sum(F.when(is_t, 1).otherwise(0)).cast("bigint").alias("n_t"),
        F.sum(F.when(is_t, 0).otherwise(1)).cast("bigint").alias("n_c"),
    )
    term_t = (
        "(CAST(n_t AS DOUBLE) - CAST(n_t + n_c AS DOUBLE) / 2)"
        " * (CAST(n_t AS DOUBLE) - CAST(n_t + n_c AS DOUBLE) / 2)"
        " / (CAST(n_t + n_c AS DOUBLE) / 2)"
    )
    term_c = (
        "(CAST(n_c AS DOUBLE) - CAST(n_t + n_c AS DOUBLE) / 2)"
        " * (CAST(n_c AS DOUBLE) - CAST(n_t + n_c AS DOUBLE) / 2)"
        " / (CAST(n_t + n_c AS DOUBLE) / 2)"
    )
    return c.select(
        "window_start",
        "n_t",
        "n_c",
        F.expr("CAST(n_t + n_c AS BIGINT)").alias("n_total"),
        F.expr("CAST(n_t + n_c AS DOUBLE) / 2").alias("expected"),
        F.expr(f"{term_t} + {term_c}").alias("srm_chi2"),
    )
