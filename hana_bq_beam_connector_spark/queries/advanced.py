"""Advanced relational coverage: exact median, ordered string agg,
pivot, scalar subqueries, approximate percentiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hana_bq_beam_connector_spark.queries import register
from hana_bq_beam_connector_spark.sources.files import load_table

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


@register(
    "agg_median_exact",
    """
    WITH r AS (
      SELECT o_orderpriority, o_totalprice,
        ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice, o_orderkey) AS rn_asc,
        ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice DESC, o_orderkey DESC)
          AS rn_desc
      FROM orders
    )
    SELECT o_orderpriority,
           SUM(o_totalprice) / COUNT(*) AS median_price
    FROM r
    WHERE rn_asc = rn_desc OR rn_asc = rn_desc + 1 OR rn_asc + 1 = rn_desc
    GROUP BY o_orderpriority
    """,
    doc="Exact median without an engine median() (interpolation "
    "conventions differ): symmetric row_number selects the middle "
    "1-2 rows, their mean is one or two IEEE ops — distributed as "
    "two window scans, no global sort.",
)
def agg_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    wa = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    wd = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").desc()
    )
    r = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(wa).alias("rn_asc"),
        F.row_number().over(wd).alias("rn_desc"),
    )
    mid = r.where(
        (F.col("rn_asc") == F.col("rn_desc"))
        | (F.col("rn_asc") == F.col("rn_desc") + 1)
        | (F.col("rn_asc") + 1 == F.col("rn_desc"))
    )
    return mid.groupBy("o_orderpriority").agg(
        (F.sum("o_totalprice") / F.count(F.lit(1))).alias("median_price")
    )


@register(
    "agg_collect_sorted",
    """
    SELECT n.n_name,
           string_agg(s.s_name, ',' ORDER BY s.s_name) AS suppliers,
           COUNT(*) AS n_suppliers
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="Ordered string aggregation (collect_list -> array_sort -> "
    "join): deterministic listagg semantics across engines.",
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list("s_name")), ","
            ).alias("suppliers"),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
    )


@register(
    "pivot_segment_counts",
    f"""
    SELECT c_nationkey,
      {", ".join(
        f"COUNT(*) FILTER (WHERE c_mktsegment = '{seg}') AS {seg}"
        for seg in SEGMENTS
      )}
    FROM customer
    GROUP BY c_nationkey
    """,
    doc="Pivot (long->wide): one hash agg with per-column filters; "
    "pivot values passed explicitly so the schema is static at plan "
    "time (required for a deterministic contract at any scale).",
)
def pivot_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .pivot("c_mktsegment", SEGMENTS)
        .agg(F.count(F.lit(1)))
        .na.fill(0, SEGMENTS)
    )


@register(
    "subquery_above_avg_balance",
    """
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_acctbal > (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*)
      FROM customer
    )
    """,
    doc="Uncorrelated scalar subquery: the single aggregate broadcasts "
    "as a literal into the filter (exact decimal mean, so the "
    "boundary compare is deterministic).",
)
def subquery_above_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    mean = (
        c.agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        ).first()["m"]
    )
    return c.where(F.col("c_acctbal") > mean).select("c_custkey", "c_acctbal")


@register(
    "agg_approx_percentiles",
    """
    WITH q AS (
      SELECT l_returnflag,
        quantile_disc(l_extendedprice, 0.25) AS q0,
        quantile_disc(l_extendedprice, 0.50) AS q1,
        quantile_disc(l_extendedprice, 0.75) AS q2,
        COUNT(*) AS n_items
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, i AS quartile_idx,
      CASE i WHEN 0 THEN q0 WHEN 1 THEN q1 ELSE q2 END AS price,
      n_items
    FROM q CROSS JOIN (SELECT unnest(range(0, 3)) AS i)
    """,
    doc="approx_percentile (GK sketch): the 100 TB path for quantiles "
    "— one pass, bounded memory, no global sort.  Run here in the "
    "sketch's exact regime: accuracy 1e8 makes the GK rank window "
    "eps*n < 1 wide at every test SF, so the sketch provably returns "
    "the exact discrete quantile REGARDLESS of partial-merge order — "
    "which is what lets a sketch query have a value-exact SQL oracle "
    "(quantile_disc).  At 100 TB you dial accuracy down and trade "
    "exactness for the O(accuracy*log(eps*n)) memory bound; the "
    "est-vs-exact error bound at production accuracy is asserted in "
    "tests/test_sketch.py.",
)
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.percentile_approx(
            "l_extendedprice", [0.25, 0.5, 0.75], 100_000_000
        ).alias("price_quartiles"),
        F.count(F.lit(1)).alias("n_items"),
    )
    # One row per (flag, quartile): scalar columns only — the driver's
    # canonicalizer sorts every output column, which array cells break.
    out = agg.select(
        "l_returnflag",
        F.posexplode("price_quartiles").alias("quartile_idx", "price"),
        "n_items",
    )
    return out.withColumn("quartile_idx", F.col("quartile_idx").cast("long"))


@register(
    "subquery_correlated_part_avg",
    """
    WITH pa AS (
      SELECT l_partkey,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
          / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l.l_partkey, COUNT(*) AS n_small,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        AS small_revenue
    FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
    WHERE l.l_quantity < 0.5 * pa.avg_qty
    GROUP BY l.l_partkey
    """,
    doc="Correlated scalar subquery (TPC-H Q17 shape), decorrelated "
    "the way every engine must at scale: per-key aggregate once, "
    "equi-join back — one shuffle on l_partkey reused by both the "
    "aggregate and the join, never a per-row subquery execution.",
)
def subquery_correlated_part_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pa = li.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    return (
        li.join(pa, on="l_partkey")
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("small_revenue"),
        )
    )


@register(
    "subquery_not_exists_customers",
    """
    SELECT c.c_nationkey, COUNT(*) AS n_customers,
      CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        AS total_acctbal
    FROM customer c
    WHERE c.c_acctbal > 0.0
      AND NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      )
    GROUP BY 1
    """,
    doc="NOT EXISTS anti-join (TPC-H Q22 shape): Catalyst plans the "
    "subquery as a left-anti hash join on c_custkey — no correlated "
    "re-execution; the agg then groups the survivors by nation.",
)
def subquery_not_exists_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.where(F.col("c_acctbal") > 0.0)
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_acctbal"),
        )
    )


@register(
    "join_having_big_orders",
    """
    WITH big AS (
      SELECT l_orderkey,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
    )
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice, big.sum_qty
    FROM big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
    doc="Large-volume orders (TPC-H Q18 shape): HAVING-filtered "
    "aggregate drives the join — the agg output is tiny, so both "
    "upstream joins hash on already-reduced data; the big lineitem "
    "table is touched exactly once.",
)
def join_having_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_sq")
        )
        .where(F.col("_sq") > 150)
        .select(
            "l_orderkey", F.col("_sq").cast("double").alias("sum_qty")
        )
    )
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select("c_custkey", "o_orderkey", "o_totalprice", "sum_qty")
    )


@register(
    "agg_conditional_promo_share",
    """
    SELECT l.l_returnflag,
      CAST(SUM(CASE WHEN p.p_type = 'PROMO'
            THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
            ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        AS total_revenue,
      COUNT(*) FILTER (WHERE p.p_type = 'PROMO') AS n_promo
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY l.l_returnflag
    """,
    doc="Promo revenue share (TPC-H Q14 shape): conditional aggregate "
    "over a fact-dim join — part broadcasts, lineitem never shuffles "
    "for the join, only the 3-group agg exchanges.",
)
def agg_conditional_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    dec_price = F.col("l_extendedprice").cast("decimal(18,2)")
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", dec_price).otherwise(zero))
            .cast("double")
            .alias("promo_revenue"),
            F.sum(dec_price).cast("double").alias("total_revenue"),
            F.count(F.when(F.col("p_type") == "PROMO", F.lit(1))).alias(
                "n_promo"
            ),
        )
    )


@register(
    "agg_histogram_equiwidth",
    """
    WITH b AS (
      SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
      FROM orders
    )
    SELECT
      CAST(LEAST(FLOOR((o_totalprice - b.lo)
                       / ((b.hi - b.lo) / 20)), 19) AS BIGINT) AS bucket,
      COUNT(*) AS n,
      MIN(o_totalprice) AS bucket_min,
      MAX(o_totalprice) AS bucket_max
    FROM orders, b
    GROUP BY 1
    """,
    doc="Equi-width histogram (20 buckets over [min, max]): global "
    "bounds from one tiny aggregate broadcast-crossed onto the fact "
    "scan, bucket index = floor((v - lo)/width) clamped to the last "
    "bucket — identical IEEE subtract/divide/floor in both engines.  "
    "Two scans total (bounds + counts), one partial-agg'd shuffle of "
    "(bucket, count) pairs; the NTILE alternative is a global sort.",
)
def agg_histogram_equiwidth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    b = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(20)
    bucket = F.least(
        F.floor((F.col("o_totalprice") - F.col("lo")) / width), F.lit(19)
    ).cast("long")
    return (
        o.join(F.broadcast(b))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("bucket_min"),
            F.max("o_totalprice").alias("bucket_max"),
        )
    )


@register(
    "subquery_lateral_topk",
    """
    SELECT n.n_name, top.c_name, top.c_acctbal
    FROM nation n, LATERAL (
      SELECT c_name, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_name LIMIT 2
    ) top
    """,
    doc="Correlated LATERAL subquery (SQL:1999 lateral derived "
    "table, Spark 4 + DuckDB): top-2 customers by balance per "
    "nation, expressed as a per-row dependent subquery.  Catalyst "
    "decorrelates this into the same window-rank-filter plan the "
    "DataFrame top-k uses — the test that the engine's SQL surface "
    "accepts the idiom, not just its DataFrame equivalent.  Ties "
    "break on name so the emitted pair set is deterministic.  "
    "Scale note: the decorrelated window partitions by the FIXED "
    "25-value nation key; the production spelling of this shape is "
    "topk_per_group_skewed (operators/relational.py), which caps "
    "each group on salted subtasks first.",
)
def subquery_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_lv")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_lv"
    )
    return spark.sql(
        """
        SELECT n.n_name, top.c_name, top.c_acctbal
        FROM nation_lv n, LATERAL (
          SELECT c_name, c_acctbal FROM customer_lv c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 2
        ) top
        """
    )


@register(
    "agg_histogram_equidepth",
    """
    WITH b AS (
      SELECT o_totalprice,
             CAST(NTILE(16) OVER (ORDER BY o_totalprice, o_orderkey)
                  AS BIGINT) AS bucket
      FROM orders
    )
    SELECT bucket, COUNT(*) AS n_rows,
           MIN(o_totalprice) AS lo_price,
           MAX(o_totalprice) AS hi_price
    FROM b GROUP BY bucket
    """,
    doc="Equi-DEPTH histogram (the optimizer-statistics twin of the "
    "equi-width one): NTILE(16) over the price order assigns "
    "near-equal row counts per bucket, then each bucket reports its "
    "exact [lo, hi] value band.  Ties break on o_orderkey so bucket "
    "assignment is deterministic.  min/max pass raw doubles through "
    "untouched (no arithmetic), so the hashes match bit-for-bit.  "
    "Scale note: a global NTILE is a single-partition sort — fine for "
    "stats sampling, and the scale path (approx quantile boundaries "
    "+ range join) is what plans/chunking.py already implements for "
    "the copy pipeline.",
)
def agg_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    b = o.select(
        "o_totalprice",
        F.ntile(16).over(w).cast("bigint").alias("bucket"),
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("o_totalprice").alias("lo_price"),
        F.max("o_totalprice").alias("hi_price"),
    )


@register(
    "agg_percentiles_exact_nearest_rank",
    """
    WITH r AS (
      SELECT o_orderpriority, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(MAX(n) AS BIGINT) AS n_rows,
           MIN(CASE WHEN rn = CAST(CEIL(0.25 * n) AS BIGINT)
                    THEN o_totalprice END) AS p25,
           MIN(CASE WHEN rn = CAST(CEIL(0.50 * n) AS BIGINT)
                    THEN o_totalprice END) AS p50,
           MIN(CASE WHEN rn = CAST(CEIL(0.75 * n) AS BIGINT)
                    THEN o_totalprice END) AS p75,
           MIN(CASE WHEN rn = CAST(CEIL(0.95 * n) AS BIGINT)
                    THEN o_totalprice END) AS p95
    FROM r GROUP BY o_orderpriority
    """,
    doc="Exact percentiles by the nearest-rank convention (value at "
    "row ceil(p*n) — no interpolation, so the output is a real data "
    "value passed through untouched and the hash matches "
    "bit-for-bit).  One ranked window pass + one aggregate emits the "
    "whole p25/p50/p75/p95 band per group; the ceil products are "
    "single IEEE multiplies of identical operands in both engines.  "
    "Complements agg_median_exact (interpolated) and "
    "agg_approx_percentiles (sketched): convention-exact bands for "
    "SLA-style reporting.",
)
def agg_percentiles_exact_nearest_rank(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    w_all = Window.partitionBy("o_orderpriority")
    r = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )

    def at(p: float, alias: str):
        idx = F.ceil(F.lit(p) * F.col("n")).cast("bigint")
        return F.min(
            F.when(F.col("rn") == idx, F.col("o_totalprice"))
        ).alias(alias)

    return r.groupBy("o_orderpriority").agg(
        F.max("n").cast("bigint").alias("n_rows"),
        at(0.25, "p25"),
        at(0.50, "p50"),
        at(0.75, "p75"),
        at(0.95, "p95"),
    )
