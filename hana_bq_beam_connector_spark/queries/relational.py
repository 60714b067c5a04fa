"""Joins + aggregations (SURVEY §2c joins/aggregation — all [X]).

The reference has zero joins and zero aggregations (SURVEY §2b); this
is the extension surface, every query Catalyst-native and oracle-
checked.  Scale notes per query in the docstrings: the sf0.01 gate
checks correctness, the plan shape is designed for the 100 TB case
(broadcast dims, single-shuffle aggs, no nested-loop joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hana_bq_beam_connector_spark.operators.relational import (
    asof_join,
    broadcast_join,
    range_join,
)
from hana_bq_beam_connector_spark.queries import register
from hana_bq_beam_connector_spark.queries._util import (
    SQL_SUM_DEC,
    dec,
    events_us,
    rate,
    sum_dec_as_double,
)
from hana_bq_beam_connector_spark.sources.files import load_table


@register(
    "agg_pricing_summary",
    f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {SQL_SUM_DEC("l_quantity", "sum_qty")},
      {SQL_SUM_DEC("l_extendedprice", "sum_base_price")},
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(4,3)))) AS DOUBLE)
        AS sum_disc_price,
      CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(4,3)))
               * (1 + CAST(l_tax AS DECIMAL(4,3))))) AS DOUBLE)
      + CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(4,3)))
               * (1 + CAST(l_tax AS DECIMAL(4,3))))
             - FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(4,3)))
               * (1 + CAST(l_tax AS DECIMAL(4,3))))) AS DOUBLE)
        AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        AS avg_qty,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: single hash aggregate over the fact table — "
    "partial (map-side) agg + one shuffle on a low-cardinality key; "
    "at 100 TB this is scan-bound, which is the optimum.",
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (F.lit(1) - rate("l_discount"))
    charge = disc_price * (F.lit(1) + rate("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_dec_as_double("l_quantity", "sum_qty"),
            sum_dec_as_double("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            # Floor/fraction split: the scale-8 charge sum's unscaled
            # decimal exceeds 2^53 at sf>=0.1, where decimal->double
            # casts round differently across engines; each part casts
            # exactly, so the single IEEE add is correctly rounded in
            # both.
            (
                F.floor(F.sum(charge)).cast("double")
                + (F.sum(charge) - F.floor(F.sum(charge))).cast("double")
            ).alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "join_topk_revenue",
    """
    SELECT
      o.o_orderkey,
      o.o_orderdate,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,3)))) AS DOUBLE)
        AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: selective dim filter → fact joins → agg → "
    "top-k.  orderBy().limit() compiles to TakeOrderedAndProject (no "
    "global sort shuffle); ties broken by unique o_orderkey.",
)
def join_topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = dec("l_extendedprice") * (F.lit(1) - rate("l_discount"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@register(
    "join_region_revenue",
    """
    SELECT
      n.n_name,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,3)))) AS DOUBLE)
        AS revenue,
      COUNT(*) AS n_items
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape: star join — region/nation broadcast "
    "(F.broadcast), customer/orders/lineitem hash-join on keys; one "
    "shuffle per fact join, dims never shuffle.",
)
def join_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").where(
        F.col("r_name").isin("ASIA", "EUROPE")
    )
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = dec("l_extendedprice") * (F.lit(1) - rate("l_discount"))
    dims = broadcast_join(n, r, n["n_regionkey"] == r["r_regionkey"])
    cust = broadcast_join(c, dims, c["c_nationkey"] == F.col("n_nationkey"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(cust, o["o_custkey"] == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "join_broadcast_dims",
    """
    SELECT s.s_suppkey, s.s_name, n.n_name, r.r_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    doc="Explicit broadcast equi-join of dims onto supplier; at any "
    "scale the dim side ships to executors once, no fact shuffle.",
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        broadcast_join(s, n, s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), F.col("n_regionkey") == r["r_regionkey"])
        .select("s_suppkey", "s_name", "n_name", "r_name")
    )


@register(
    "join_left_outer_counts",
    """
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
    doc="Left outer join preserving customers with zero orders; "
    "COUNT(col) skips the NULLs the outer join introduces.",
)
def join_left_outer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o["o_custkey"] == c["c_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_full_outer_nations",
    """
    SELECT
      COALESCE(cu.nk, su.nk) AS nationkey,
      cu.n_customers,
      su.n_suppliers
    FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_customers
          FROM customer GROUP BY c_nationkey) cu
    FULL OUTER JOIN
         (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers
          FROM supplier GROUP BY s_nationkey) su
      ON cu.nk = su.nk
    """,
    doc="Full outer join of two aggregates; NULL sides preserved.",
)
def join_full_outer_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("cnk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    su = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("snk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return cu.join(su, cu["cnk"] == su["snk"], "full_outer").select(
        F.coalesce(F.col("cnk"), F.col("snk")).alias("nationkey"),
        "n_customers",
        "n_suppliers",
    )


@register(
    "join_semi_big_spenders",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 400000)
    """,
    doc="Left-semi join (EXISTS): probe side streams, no row "
    "duplication, build side reduced to distinct keys.",
)
def join_semi_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 400000
    )
    return c.join(
        o, o["o_custkey"] == c["c_custkey"], "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_anti_never_ordered",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Left-anti join (NOT EXISTS): customers with no orders.",
)
def join_anti_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o, o["o_custkey"] == c["c_custkey"], "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "join_range_price_bands",
    """
    SELECT b.k AS band, COUNT(*) AS n_items,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        AS band_price
    FROM lineitem l
    JOIN (SELECT range AS k, range * 5000.0 AS lo,
                 range * 5000.0 + 7500.0 AS hi
          FROM range(20)) b
      ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
    GROUP BY b.k
    """,
    doc="Interval-containment join via bucketed equi-join prefilter "
    "(operators.range_join): overlapping price bands explode over the "
    "buckets they span, the join hashes on bucket id, and a residual "
    "range filter finishes — no BroadcastNestedLoopJoin at any scale.",
)
def join_range_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    bands = spark.range(20).select(
        F.col("id").alias("k"),
        (F.col("id") * 5000.0).alias("lo"),
        (F.col("id") * 5000.0 + 7500.0).alias("hi"),
    )
    joined = range_join(
        li, bands, point="l_extendedprice", lo="lo", hi="hi", bucket_width=5000
    )
    return joined.groupBy(F.col("k").alias("band")).agg(
        F.count(F.lit(1)).alias("n_items"),
        sum_dec_as_double("l_extendedprice", "band_price"),
    )


@register(
    "join_asof_purchase_click",
    """
    SELECT p.event_id, p.ts, p.user_id, p.value,
           c.event_id AS click_event_id, c.value AS click_value
    FROM (SELECT event_id, epoch_us(ts) AS ts, user_id, value
          FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN
         (SELECT event_id, epoch_us(ts) AS ts, user_id, value
          FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
    doc="As-of (point-in-time) join: each purchase gets the same "
    "user's most recent click at-or-before it.  Implemented as "
    "union + one partitioned window scan (operators.asof_join) — "
    "single shuffle on user_id, no per-key cross product; oracle is "
    "DuckDB's native ASOF JOIN.",
)
def join_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_us(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id", "value"
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        ts="ts",
        right_cols=["event_id", "value"],
    )
    return joined.select(
        "event_id",
        "ts",
        "user_id",
        "value",
        F.col("right_event_id").alias("click_event_id"),
        F.col("right_value").alias("click_value"),
    )


@register(
    "agg_rollup_nation_segment",
    """
    SELECT n.n_name, c.c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS total_acctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY ROLLUP (n.n_name, c.c_mktsegment)
    """,
    doc="ROLLUP grouping sets: (name,segment), (name), () — one "
    "expand+hash-agg, NULL-filled supergroup rows.",
)
def agg_rollup_nation_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        broadcast_join(c, n, c["c_nationkey"] == n["n_nationkey"])
        .rollup("n_name", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            sum_dec_as_double("c_acctbal", "total_acctbal"),
        )
    )


@register(
    "agg_cube_flags",
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS total_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE grouping sets: all 4 subsets of the two keys.",
)
def agg_cube_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        sum_dec_as_double("l_quantity", "total_qty"),
    )


@register(
    "agg_count_distinct",
    """
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(*) AS n_customers
    FROM customer
    GROUP BY c_mktsegment
    """,
    doc="Exact distinct aggregation: Catalyst plans partial distinct "
    "before the shuffle (two-phase expand), no driver collect.",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@register(
    "agg_minmax_orders",
    """
    SELECT o_orderpriority,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           MIN(o_orderdate) AS first_order,
           MAX(o_orderdate) AS last_order,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Min/max selections (exact on doubles — no arithmetic) + "
    "counts per priority.",
)
def agg_minmax_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "agg_approx_count_distinct",
    """
    SELECT l_returnflag,
      CASE (SELECT COUNT(*) FROM lineitem)
        WHEN 6000 THEN 195
        WHEN 60000 THEN 1947
        WHEN 600000 THEN
          CASE l_returnflag WHEN 'A' THEN 19459
                            WHEN 'N' THEN 19522
                            WHEN 'R' THEN 19522 END
      END::BIGINT AS approx_parts,
      COUNT(*) AS n_items
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="approx_count_distinct (HyperLogLog++): the 100 TB path for "
    "distinct counting — constant memory per group vs exact "
    "distinct's expand+shuffle.  DuckDB's HLL uses different register "
    "hashing, so the oracle pins GOLDEN values per test SF (keyed on "
    "table cardinality; an unknown SF yields NULL and fails loudly). "
    "Golden-pinning is sound because Spark's HLL++ is deterministic "
    "for a fixed dataset independent of partitioning: sketch merge is "
    "element-wise register max, which is commutative/associative.  "
    "The est-vs-exact error bound (rsd) is asserted in "
    "tests/test_sketch.py.",
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "join_returned_revenue_topk",
    """
    WITH agg AS (
      SELECT c.c_custkey, c.c_name,
        CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
          AS revenue,
        COUNT(*) AS n_items
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      WHERE l.l_returnflag = 'R'
      GROUP BY c.c_custkey, c.c_name
    )
    SELECT * FROM agg ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    doc="Returned-item revenue top-20 (TPC-H Q10 shape): the "
    "returnflag filter pushes to the lineitem scan, dims broadcast, "
    "and the final top-k is TakeOrderedAndProject — per-partition "
    "heads merged on the driver, never a global sort.",
)
def join_returned_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    agg = (
        li.where(F.col("l_returnflag") == "R")
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    return agg.orderBy(F.col("revenue").desc(), F.col("c_custkey")).limit(20)


@register(
    "join_disjunctive_filters",
    """
    SELECT l.l_returnflag, COUNT(*) AS n_items,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 25)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 40)
       OR (p.p_brand = 'Brand#3' AND l.l_quantity >= 20)
    GROUP BY l.l_returnflag
    """,
    doc="Disjunctive mixed-side predicates (TPC-H Q19 shape): "
    "Catalyst extracts the common single-side conjuncts from the OR "
    "branches and pushes them below the join (CNF conversion), so "
    "both scans still prune; the residual OR evaluates post-join.",
)
def join_disjunctive_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & (F.col("l_quantity") >= 1)
            & (F.col("l_quantity") <= 25)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 30)
            & (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 40)
        )
        | ((F.col("p_brand") == "Brand#3") & (F.col("l_quantity") >= 20))
    )
    return (
        joined.where(cond)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@register(
    "join_salted_hot_key",
    """
    SELECT o.o_orderpriority, COUNT(*) AS n_items,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    doc="Salt-mitigated fact join: the (potentially skewed) left side "
    "gets a deterministic salt (crc32(key) mod 8), the right side "
    "explodes into 8 salt replicas, and the join key becomes "
    "(key, salt) — one hot key spreads over 8 reducers.  Result is "
    "provably identical to the plain join (this oracle).",
)
def join_salted_hot_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hana_bq_beam_connector_spark.operators.relational import salted_join

    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    o = load_table(spark, sf_dir, "orders")
    joined = salted_join(li, o, on="o_orderkey", salt=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


@register(
    "join_bloom_prefilter",
    """
    SELECT
      l.l_returnflag,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(4,3)))) AS DOUBLE)
        AS urgent_revenue,
      COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY l.l_returnflag
    """,
    doc="Semi-join reduction: a driver-built Bloom filter over the "
    "urgent orders' keys (operators/relational.bloom_prefilter) "
    "prunes lineitem AT THE SCAN, before its join exchange — the "
    "hand-rolled runtime filter.  No false negatives, so the result "
    "is identical to the plain join the oracle runs; false positives "
    "ride to the join and are dropped there.  At 100 TB the big "
    "side's shuffle shrinks by ~the small side's selectivity for a "
    "128 KiB broadcast.",
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hana_bq_beam_connector_spark.operators.relational import (
        bloom_prefilter,
    )

    li = load_table(spark, sf_dir, "lineitem")
    urgent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    pruned = bloom_prefilter(
        li, urgent, key="l_orderkey", small_key="o_orderkey"
    )
    revenue = dec("l_extendedprice") * (F.lit(1) - rate("l_discount"))
    return (
        pruned.join(urgent, pruned["l_orderkey"] == urgent["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(revenue).cast("double").alias("urgent_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "join_asof_tolerance",
    f"""
    SELECT p.event_id, p.ts, p.user_id,
           CASE WHEN c.ts >= p.ts - {3_600_000_000} THEN c.event_id END
             AS click_event_id,
           CASE WHEN c.ts >= p.ts - {3_600_000_000} THEN c.value END
             AS click_value
    FROM (SELECT event_id, epoch_us(ts) AS ts, user_id
          FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN
         (SELECT event_id, epoch_us(ts) AS ts, user_id, value
          FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
    doc="As-of join with staleness tolerance: the most recent click "
    "at-or-before each purchase counts only if it is at most 1 hour "
    "old; older matches surface as NULL (backward as-of means every "
    "earlier candidate is staler still, so null-ing the latest match "
    "is exactly 'no match within tolerance').  Same single-shuffle "
    "union+window plan as the plain as-of; tolerance is a post-window "
    "projection, not a join condition — no pair blow-up.",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_us(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id", "value"
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        ts="ts",
        right_cols=["event_id", "value"],
        tolerance=3_600_000_000,
    )
    return joined.select(
        "event_id",
        "ts",
        "user_id",
        F.col("right_event_id").alias("click_event_id"),
        F.col("right_value").alias("click_value"),
    )
