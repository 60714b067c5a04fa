"""Window functions (SURVEY §2c window [X]).

Ranking, analytic, and frame aggregates.  Every window partitions by
a real key — a global (unpartitioned) window moves all data to one
task, acceptable only for the reference-parity chunk planner (which
the scale path replaces with approxQuantile anyway).

Determinism: every ORDER BY ends in a unique key so ranks and frame
contents are total-ordered; frame sums go through decimal casts.
Rank-style outputs are cast to long (DuckDB window fns return BIGINT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hana_bq_beam_connector_spark.operators.relational import topk_per_group
from hana_bq_beam_connector_spark.queries import register
from hana_bq_beam_connector_spark.queries._util import dec, events_us
from hana_bq_beam_connector_spark.sources.files import load_table


@register(
    "window_topk_orders_per_customer",
    """
    SELECT c_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey)
               AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    doc="Top-3 orders per customer: rank-and-filter — one hash "
    "shuffle on the group key, no global sort (operators."
    "topk_per_group).",
)
def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    ranked = topk_per_group(
        o.select(
            F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"
        ),
        partition_by=["c_custkey"],
        order=[F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
    )
    return ranked.withColumn("rn", F.col("rn").cast("long"))


@register(
    "window_rank_dense_ntile",
    """
    SELECT c_custkey, c_acctbal,
      CAST(RANK() OVER w AS BIGINT) AS rnk,
      CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
      CAST(NTILE(4) OVER w AS BIGINT) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal DESC, c_custkey)
    """,
    doc="rank/dense_rank/ntile per market segment, total-ordered.",
)
def window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_acctbal",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@register(
    "window_lag_lead_orders",
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
      LAG(o_totalprice) OVER w AS prev_price,
      LEAD(o_totalprice) OVER w AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="lag/lead over each customer's order history.",
)
def window_lag_lead_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@register(
    "window_running_total",
    """
    SELECT o_custkey, o_orderkey,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS DOUBLE) AS running_total
    FROM orders
    """,
    doc="Running sum (rows frame) of each customer's spend, exact "
    "decimal accumulation.",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


@register(
    "window_moving_avg",
    """
    SELECT o_custkey, o_orderkey,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        / COUNT(*) OVER w AS moving_avg
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    doc="Moving average over a 3-row frame: exact decimal sum / exact "
    "frame count, one IEEE division.",
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(dec("o_totalprice")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg"),
    )


@register(
    "window_range_frame_events",
    """
    SELECT event_id, user_id,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        PARTITION BY user_id ORDER BY epoch_us(ts)
        RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW
      ) AS DOUBLE) AS value_10min
    FROM events
    """,
    doc="RANGE frame: per user, sum of event values in the trailing "
    "10 minutes (600e6 µs) — the event-time analog of a sliding "
    "window, computed with one shuffle on user_id.",
)
def window_range_frame_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_us(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rangeBetween(-600_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(dec("value")).over(w).cast("double").alias("value_10min"),
    )


@register(
    "window_first_last",
    """
    SELECT DISTINCT o_custkey,
      FIRST_VALUE(o_orderdate) OVER w AS first_order_date,
      LAST_VALUE(o_totalprice) OVER w AS last_order_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="first_value/last_value over the full partition frame, "
    "collapsed to one row per customer.",
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        F.first("o_orderdate").over(w).alias("first_order_date"),
        F.last("o_totalprice").over(w).alias("last_order_price"),
    ).distinct()


@register(
    "window_percent_rank_cume",
    """
    SELECT o_orderpriority, o_orderkey,
      PERCENT_RANK() OVER w AS pct_rank,
      CUME_DIST() OVER w AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
    doc="Relative-position analytics (percent_rank, cume_dist): pure "
    "integer-ratio arithmetic on ranks, deterministic via the unique "
    "orderkey tiebreak; one shuffle on the partition key.",
)
def window_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "window_running_distinct",
    """
    WITH flagged AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
             CASE WHEN ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type
               ORDER BY epoch_us(ts), event_id) = 1
             THEN 1 ELSE 0 END AS first_seen
      FROM events
    )
    SELECT user_id, ts_us, event_id,
           CAST(SUM(first_seen) OVER (
             PARTITION BY user_id ORDER BY ts_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS distinct_types_so_far
    FROM flagged
    """,
    doc="Running distinct count (distinct event types seen so far per "
    "user): COUNT(DISTINCT) isn't a window aggregate in either "
    "engine, and a per-row collect_set frame holds O(cardinality) "
    "state on every row.  The two-pass spelling is exact with O(1) "
    "row state: pass 1 flags each (user, type)'s first occurrence "
    "(row_number = 1), pass 2 running-sums the flags — two window "
    "scans over the same user_id hash partitioning, which Spark "
    "reuses (one exchange, the second sort is partition-local).",
)
def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_us(spark, sf_dir).select(
        "user_id", F.col("ts").alias("ts_us"), "event_id", "event_type"
    )
    first_w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts_us", "event_id"
    )
    run_w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.withColumn(
        "first_seen",
        F.when(F.row_number().over(first_w) == 1, 1).otherwise(0),
    )
    return flagged.select(
        "user_id",
        "ts_us",
        "event_id",
        F.sum("first_seen").over(run_w).cast("long").alias(
            "distinct_types_so_far"
        ),
    )


@register(
    "window_rising_streaks",
    """
    WITH seq AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        CASE WHEN o_totalprice >
               LAG(o_totalprice) OVER w THEN 0 ELSE 1 END AS brk
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey)
    ),
    isl AS (
      SELECT o_custkey,
        SUM(brk) OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                       ROWS UNBOUNDED PRECEDING) AS island
      FROM seq
    ),
    runs AS (
      SELECT o_custkey, island, COUNT(*) AS run_len
      FROM isl GROUP BY o_custkey, island
    )
    SELECT o_custkey, CAST(MAX(run_len) AS BIGINT) AS longest_streak
    FROM runs GROUP BY o_custkey
    HAVING MAX(run_len) >= 4
    """,
    doc="Gaps-and-islands STREAK detection: per customer, the longest "
    "run of strictly price-increasing consecutive orders (ordered by "
    "date with order-key tiebreak) — the classic sessionization "
    "cousin where the island boundary is a VALUE condition (price "
    "dropped) instead of a time gap.  LAG flags breaks, a running "
    "sum numbers islands, two tiny aggregates rank them; emitted "
    "rows are customers with a >= 4-order rising streak so the "
    "result is interesting at every SF.  One shuffle on o_custkey — "
    "the windows and both aggregates share the partition key, so "
    "Catalyst reuses the exchange.  The island running sum MUST "
    "accumulate in the SAME (date, orderkey) order that defined the "
    "break flags — numbering islands in a different total order "
    "regroups rows and inflates run lengths (caught by the naive "
    "reference test before it shipped; both engines had agreed with "
    "each other while both were wrong).",
)
def window_rising_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.when(
            F.col("o_totalprice") > F.lag("o_totalprice").over(w), 0
        )
        .otherwise(1)
        .alias("brk"),
    )
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    isl = seq.select(
        "o_custkey", F.sum("brk").over(w_run).alias("island")
    )
    runs = isl.groupBy("o_custkey", "island").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return (
        runs.groupBy("o_custkey")
        .agg(F.max("run_len").cast("bigint").alias("longest_streak"))
        .where(F.col("longest_streak") >= 4)
    )
