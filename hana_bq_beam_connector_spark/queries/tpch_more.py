"""Wider TPC-H-shaped relational coverage (SURVEY §2c joins/aggregation).

The reference implements none of these (SURVEY §2b: no joins, no
aggregations — `HanaToBQ.java` is a single linear copy); they are the
[X] extension surface.  Shapes covered here that the rest of the
registry doesn't: nation-pair volume joins (Q7), market-share
conditional ratios (Q8), profit rollups on a regex-filtered dim (Q9),
two-level aggregation distributions (Q13), scalar-max subquery over a
derived table (Q15), exact moment statistics (variance/stddev from
exact decimal sums), and unpivot/melt.

Determinism: every double measure goes through DECIMAL(18,2) sums
(exact) and is surfaced via the identical IEEE expression in both
engines — see queries/__init__ docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hana_bq_beam_connector_spark.operators._common import (
    persist_reused as _persist,
)
from hana_bq_beam_connector_spark.queries import register
from hana_bq_beam_connector_spark.queries._util import (
    dec,
    rate,
    sum_dec_as_double,
)
from hana_bq_beam_connector_spark.sources.files import load_table

_DISC_PRICE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (1 - CAST(l_discount AS DECIMAL(4,3)))"
)


def _disc_price() -> F.Column:
    return dec("l_extendedprice") * (F.lit(1) - rate("l_discount"))


@register(
    "join_nation_volume_pairs",
    f"""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
           CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey  = c.c_custkey
    JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
    JOIN supplier s  ON l.l_suppkey  = s.s_suppkey
    JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
    WHERE (cn.n_name = 'NATION_1' AND sn.n_name = 'NATION_2')
       OR (cn.n_name = 'NATION_2' AND sn.n_name = 'NATION_1')
    GROUP BY cust_nation, supp_nation, ship_year
    """,
    doc="TPC-H Q7 shape: two independent dim chains (customer-nation "
    "and supplier-nation) meet at the fact table with a disjunctive "
    "nation-pair predicate.  Both nation dims broadcast; the only "
    "shuffles are the two fact-side equi-joins; the pair filter "
    "evaluates post-join (it references both chains) while each "
    "chain's IN('NATION_1','NATION_2') half pushes below.",
)
def join_nation_volume_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    pair = ["NATION_1", "NATION_2"]
    cn = n.where(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    )
    sn = n.where(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    cust = c.join(F.broadcast(cn), c["c_nationkey"] == F.col("cnk"))
    supp = s.join(F.broadcast(sn), s["s_nationkey"] == F.col("snk"))
    joined = (
        li.join(F.broadcast(supp), li["l_suppkey"] == F.col("s_suppkey"))
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(cust, o["o_custkey"] == F.col("c_custkey"))
        .where(
            ((F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_2"))
            | ((F.col("cust_nation") == "NATION_2") & (F.col("supp_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "cust_nation",
        "supp_nation",
        F.year("l_shipdate").cast("long").alias("ship_year"),
    ).agg(
        F.sum(_disc_price()).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "join_market_share",
    f"""
    SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS order_year,
           CAST(SUM(CASE WHEN sn.n_name = 'NATION_5'
                         THEN {_DISC_PRICE_SQL}
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS mkt_share,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey  = c.c_custkey
    JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
    JOIN region r    ON cn.n_regionkey = r.r_regionkey
    JOIN supplier s  ON l.l_suppkey  = s.s_suppkey
    JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY order_year
    """,
    doc="TPC-H Q8 shape: market share = conditional-sum / sum, both "
    "through exact decimal sums and one IEEE division of identical "
    "operands.  Region/nation dims broadcast; supplier-nation flag "
    "rides the fact rows into one hash aggregate.",
)
def join_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cn = n.join(
        F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]
    ).select(F.col("n_nationkey").alias("cnk"))
    sn = n.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    cust = c.join(F.broadcast(cn), c["c_nationkey"] == F.col("cnk"))
    supp = s.join(F.broadcast(sn), s["s_nationkey"] == F.col("snk"))
    disc = _disc_price()
    national = F.when(F.col("supp_nation") == "NATION_5", disc).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(supp), li["l_suppkey"] == F.col("s_suppkey"))
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(cust, o["o_custkey"] == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            (
                F.sum(national).cast("double")
                / F.sum(disc).cast("double")
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "join_profit_by_nation_year",
    f"""
    SELECT sn.n_name AS supp_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
           CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS profit,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p      ON l.l_partkey = p.p_partkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY supp_nation, ship_year
    """,
    doc="TPC-H Q9 shape (sans partsupp, absent from the fixtures): "
    "regex-ish LIKE filter on the part dim prunes before the "
    "broadcast join; profit rolls up by supplier nation and year. "
    "The LIKE filter reaches the part scan (PushedFilters "
    "StringContains), so the broadcast build side is pre-shrunk.",
)
def join_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").contains("red"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    supp = s.join(F.broadcast(n), s["s_nationkey"] == F.col("snk"))
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == F.col("s_suppkey"))
        .groupBy(
            "supp_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(
            F.sum(_disc_price()).cast("double").alias("profit"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "agg_order_count_distribution",
    """
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority NOT LIKE '1-%'
      GROUP BY c.c_custkey
    ) per_cust
    GROUP BY n_orders
    """,
    doc="TPC-H Q13 shape: two-level aggregation — orders per customer "
    "(zero-preserving outer join with a join-side filter), then the "
    "distribution of those counts.  First agg shuffles on c_custkey, "
    "second on the tiny n_orders domain (AQE coalesces it).",
)
def agg_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        ~F.col("o_orderpriority").like("1-%")
    )
    per_cust = (
        c.join(o, o["o_custkey"] == c["c_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@register(
    "join_top_supplier_revenue",
    f"""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
    doc="TPC-H Q15 shape: revenue view + scalar-max subquery.  The "
    "per-supplier aggregate is one shuffle; the MAX reduces to a "
    "single broadcast row joined back on an exact double equality "
    "(both sides are the same computed value, so equality is sound).",
)
def join_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_disc_price()).cast("double").alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx), rev["total_revenue"] == F.col("mx"))
        .join(F.broadcast(s), rev["l_suppkey"] == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "agg_variance_exact",
    """
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                     * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
            - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
              * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
              / COUNT(*)) / COUNT(*) AS var_pop_qty,
           SQRT((CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                     * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
            - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
              * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
              / COUNT(*)) / COUNT(*)) AS stddev_pop_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Exact moment statistics: population variance/stddev computed "
    "from exact decimal sums (sum, sum-of-squares, count) with one "
    "fixed IEEE expression — engine-native var_pop/stddev use "
    "differing streaming algorithms (Welford vs textbook) whose "
    "float error differs, so the sums themselves are the portable "
    "formulation.  One map-side-combined hash aggregate; the squared "
    "term stays in DECIMAL so no cancellation until the final "
    "subtraction (values ≤ 2^53, exact in double).",
)
def agg_variance_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = dec("l_quantity")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(q * q).cast("double").alias("_s2"),
        F.sum(q).cast("double").alias("_s1"),
    )
    var = (F.col("_s2") - F.col("_s1") * F.col("_s1") / F.col("n_items")) / F.col(
        "n_items"
    )
    return agg.select(
        "l_returnflag",
        "n_items",
        var.alias("var_pop_qty"),
        F.sqrt(var).alias("stddev_pop_qty"),
    )


@register(
    "subquery_exists_late_ship",
    """
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o.o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS with a correlated non-equi condition "
    "(lineitem shipped after its order date).  Catalyst plans a LEFT "
    "SEMI join on the equi key with the l_shipdate > o_orderdate "
    "residual — one shuffle, no decorrelation UDF; the date window "
    "pushes into the orders scan.",
)
def subquery_exists_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    hit = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return hit.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@register(
    "agg_having_share_of_total",
    """
    SELECT sn.n_name AS supp_nation,
           CAST(SUM(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS nation_bal
    FROM supplier s
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    GROUP BY supp_nation
    HAVING CAST(SUM(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE)
         > CAST((SELECT SUM(CAST(s2.s_acctbal AS DECIMAL(18,2)))
                 FROM supplier s2) AS DOUBLE) * 0.05
    """,
    doc="TPC-H Q11 shape: HAVING against a fraction of a global scalar "
    "subquery.  The global total reduces to one broadcast row (cross "
    "join of a 1-row frame); both sides of the comparison are exact "
    "decimal sums surfaced as double, so the > is deterministic.  "
    "Nation dim broadcasts; one shuffle for the per-nation aggregate.",
)
def agg_having_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    per_nation = (
        s.join(F.broadcast(n), s["s_nationkey"] == F.col("snk"))
        .groupBy("supp_nation")
        .agg(sum_dec_as_double("s_acctbal", "nation_bal"))
    )
    total = s.agg(F.sum(dec("s_acctbal")).cast("double").alias("__total"))
    return (
        per_nation.join(F.broadcast(total))
        .where(F.col("nation_bal") > F.col("__total") * 0.05)
        .select("supp_nation", "nation_bal")
    )


@register(
    "agg_supplier_cnt_by_part",
    """
    SELECT p.p_brand, p.p_type,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size IN (1, 5, 9, 13)
      AND p.p_brand <> 'Brand#1'
    GROUP BY p.p_brand, p.p_type
    """,
    doc="TPC-H Q16 shape: COUNT(DISTINCT) over a filtered dim join. "
    "The IN/<> filters push into the part scan, the shrunken dim "
    "broadcasts, and Spark expands the distinct into a two-level "
    "aggregate (partial distinct map-side, then exchange on the group "
    "keys) — no dedicated distinct shuffle of the raw fact rows.",
)
def agg_supplier_cnt_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_size").isin(1, 5, 9, 13) & (F.col("p_brand") != "Brand#1")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "join_min_bal_supplier_per_part",
    """
    WITH ps AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    ranked AS (
      SELECT p.p_partkey, s.s_suppkey, s.s_acctbal,
             MIN(s.s_acctbal) OVER (PARTITION BY p.p_partkey) AS min_bal
      FROM part p
      JOIN ps ON ps.l_partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = ps.l_suppkey
      WHERE p.p_size < 5
    )
    SELECT p_partkey, s_suppkey, s_acctbal
    FROM ranked WHERE s_acctbal = min_bal
    """,
    doc="TPC-H Q2 shape (lineitem's distinct (part,supp) pairs stand "
    "in for the absent partsupp table): per-part minimum-balance "
    "supplier via a window MIN + equality filter — the decorrelated "
    "form of Q2's correlated MIN subquery, one window shuffle on "
    "p_partkey instead of a rejoin.  Ties (exact double equality) "
    "surface identically in both engines.",
)
def join_min_bal_supplier_per_part(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_size") < 5)
    s = load_table(spark, sf_dir, "supplier")
    joined = (
        ps.join(F.broadcast(p), ps["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), ps["l_suppkey"] == s["s_suppkey"])
        .select("p_partkey", "s_suppkey", "s_acctbal")
    )
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("min_bal", F.min("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("min_bal"))
        .select("p_partkey", "s_suppkey", "s_acctbal")
    )


@register(
    "join_waiting_supplier",
    """
    WITH per_supp AS (
      SELECT l.l_orderkey, l.l_suppkey,
             MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
                      THEN 1 ELSE 0 END) AS is_late
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
      GROUP BY l.l_orderkey, l.l_suppkey
    ),
    per_order AS (
      SELECT l_orderkey,
             COUNT(*) AS n_supp,
             SUM(is_late) AS n_late
      FROM per_supp GROUP BY l_orderkey
    )
    SELECT ps.l_suppkey AS s_suppkey, COUNT(*) AS numwait
    FROM per_supp ps
    JOIN per_order po ON ps.l_orderkey = po.l_orderkey
    WHERE ps.is_late = 1 AND po.n_supp > 1 AND po.n_late = 1
    GROUP BY ps.l_suppkey
    """,
    doc="TPC-H Q21 shape: the EXISTS (another supplier in the order) "
    "+ NOT EXISTS (another LATE supplier) pair rewritten as one "
    "per-(order,supplier) aggregate plus one per-order aggregate — "
    "two shuffles on l_orderkey total, versus three self-joins of the "
    "fact table in the literal formulation; at 100 TB the rewrite "
    "also dodges the skew of hot orderkeys appearing in three join "
    "inputs at once.",
)
def join_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    )
    late = F.when(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
        1,
    ).otherwise(0)
    # per_supp feeds both the per-order rollup and the final join —
    # materialize once instead of recomputing the fact join per branch.
    per_supp = _persist(
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("is_late"))
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("is_late").alias("n_late")
    )
    return (
        per_supp.join(per_order, on="l_orderkey")
        .where(
            (F.col("is_late") == 1)
            & (F.col("n_supp") > 1)
            & (F.col("n_late") == 1)
        )
        .groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "unpivot_customer_measures",
    """
    SELECT c_custkey, 'acctbal' AS measure, c_acctbal AS val
    FROM customer
    UNION ALL
    SELECT c_custkey, 'nationkey' AS measure, CAST(c_nationkey AS DOUBLE)
    FROM customer
    """,
    doc="Unpivot/melt: wide row → (key, measure, value) long form via "
    "DataFrame.unpivot (Expand node — no shuffle, no UDF; each input "
    "row fans out to n_measures rows map-side).  Oracle is the "
    "equivalent UNION ALL (DuckDB's UNPIVOT lowers to the same).",
)
def unpivot_customer_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    )
    return c.unpivot(
        ids=["c_custkey"],
        values=["acctbal", "nationkey"],
        variableColumnName="measure",
        valueColumnName="val",
    )


@register(
    "agg_priority_by_linestatus",
    """
    SELECT l.l_linestatus AS linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY linestatus
    """,
    doc="TPC-H Q12 shape (fixtures lack l_shipmode; l_linestatus "
    "stands in): fact-fact join + conditional two-way counts.  The "
    "ship-date range pushes into the lineitem scan (partition/row-"
    "group pruning — at 100 TB this is the difference between one "
    "year and the whole table); orders prunes to 2 columns.  Both "
    "sides shuffle on l_orderkey; the CASE counts fold map-side into "
    "two BIGINTs per partition before the 2-row final agg.",
)
def agg_priority_by_linestatus(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (
            F.col("l_shipdate")
            >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
        )
        & (
            F.col("l_shipdate")
            < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
        )
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = (
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        ).otherwise(0)
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(1 - high).alias("low_line_count"),
        )
    )


@register(
    "join_excess_qty_supplier",
    """
    WITH qty AS (
      SELECT l.l_suppkey, l.l_partkey,
             SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS q
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_type = 'PROMO'
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l.l_suppkey, l.l_partkey
      HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > 70
    )
    SELECT s.s_suppkey, s.s_name, n.n_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM qty)
    """,
    doc="TPC-H Q20 shape (fixtures lack partsupp.availqty; the "
    "excess-quantity threshold applies to shipped quantity): nested "
    "semi-join on an aggregated subquery.  The PROMO part filter "
    "broadcasts into the fact scan, the per-(supplier, part) HAVING "
    "aggregate is the single fact shuffle, and the surviving "
    "supplier keys collapse to a distinct set small enough to "
    "broadcast — the supplier and nation dims never shuffle.",
)
def join_excess_qty_supplier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (
            F.col("l_shipdate")
            >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz")
        )
        & (
            F.col("l_shipdate")
            < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
        )
    )
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    qty = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(dec("l_quantity")).alias("q"))
        .where(F.col("q") > 70)
    )
    supp_keys = qty.select("l_suppkey").distinct()
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(
            F.broadcast(supp_keys),
            s["s_suppkey"] == F.col("l_suppkey"),
            "left_semi",
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select("s_suppkey", "s_name", "n_name", "s_acctbal")
    )


@register(
    "agg_key_skew_profile",
    """
    WITH per_key AS (
      SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(MAX(cnt) AS BIGINT) AS max_cnt,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST(MAX(cnt) AS DOUBLE) * COUNT(*) / SUM(cnt) AS skew_ratio
    FROM per_key
    """,
    doc="Join-key skew diagnostic: per-key counts reduced to "
    "(cardinality, hottest key count, total, max/avg ratio).  This "
    "is the measurement that decides between a plain shuffled join, "
    "AQE skew-split, and an explicit salted join (operators/"
    "relational.salted_join) before launching a 100 TB job — two "
    "hash aggs, the second over one row per key, and the profile "
    "itself costs a single shuffle of 16-byte pairs.  skew_ratio is "
    "one IEEE multiply+divide of exact integer aggregates, "
    "bit-identical across engines.",
)
def agg_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    per_key = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
        F.sum("cnt").alias("n_rows"),
        (
            F.max("cnt").cast("double")
            * F.count(F.lit(1))
            / F.sum("cnt")
        ).alias("skew_ratio"),
    )


@register(
    "agg_mode_per_group",
    """
    SELECT c_nationkey, mode_priority, n_orders FROM (
      SELECT c.c_nationkey, o.o_orderpriority AS mode_priority,
             COUNT(*) AS n_orders,
             ROW_NUMBER() OVER (
               PARTITION BY c.c_nationkey
               ORDER BY COUNT(*) DESC, o.o_orderpriority ASC
             ) AS rn
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey, o.o_orderpriority
    ) WHERE rn = 1
    """,
    doc="Statistical mode per group (most frequent order priority per "
    "customer nation, ties broken lexicographically): two-level "
    "count-then-rank — the deterministic spelling of mode() that "
    "needs only a hash agg plus a window over the tiny "
    "(group, value) count table, never a per-group collect.",
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    counts = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_nationkey", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("n_orders").desc(), F.col("o_orderpriority").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "c_nationkey",
            F.col("o_orderpriority").alias("mode_priority"),
            "n_orders",
        )
    )


@register(
    "join_null_safe_counts",
    """
    SELECT k, COUNT(*) AS n_pairs FROM (
      SELECT COALESCE(a.k, '-1') AS k
      FROM (SELECT NULLIF(o_orderpriority, '5-LOW') AS k, o_orderkey
            FROM orders WHERE o_orderkey % 7 = 0) a
      JOIN (SELECT NULLIF(o_orderpriority, '5-LOW') AS k, o_orderkey
            FROM orders WHERE o_orderkey % 11 = 0) b
        ON a.k IS NOT DISTINCT FROM b.k
    ) GROUP BY k
    """,
    doc="Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys "
    "match each other instead of silently dropping — the semantic "
    "SQL joins get wrong by default when a key is nullable; the "
    "'5-LOW' priority is nulled to manufacture a NULL key "
    "population.  Plan shape: the key has ~5 distinct values, so "
    "materializing the join emits ~n²/385 rows just to COUNT them "
    "(the registry-wide sf1 sweep measured 43× wall at 10× data for "
    "exactly that plan).  Pair counts over an equi-key factor as "
    "cnt_a(k)·cnt_b(k): each side reduces to an O(keys) count table "
    "first and the null-safe join runs on TWO ~5-row aggregates — "
    "identical answer (the oracle stays the naive pair-materializing "
    "definition, proving the factorization), O(n) not O(n²).",
)
def join_null_safe_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    k = F.expr("NULLIF(o_orderpriority, '5-LOW')")
    a = (
        o.where(F.col("o_orderkey") % 7 == 0)
        .groupBy(k.alias("ka"))
        .agg(F.count(F.lit(1)).alias("ca"))
    )
    b = (
        o.where(F.col("o_orderkey") % 11 == 0)
        .groupBy(k.alias("kb"))
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    return a.join(b, a["ka"].eqNullSafe(b["kb"])).select(
        F.coalesce(F.col("ka"), F.lit("-1")).alias("k"),
        (F.col("ca") * F.col("cb")).cast("bigint").alias("n_pairs"),
    )


@register(
    "agg_corr_exact",
    """
    WITH s AS (
      SELECT l_returnflag,
        COUNT(*) AS n_items,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                 * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        CAST(SUM(CAST(l_discount AS DECIMAL(18,2))
                 * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS syy,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                 * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sxy
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT l_returnflag, n_items,
      (sxy - sx * sy / n_items) / n_items AS cov_pop_qty_disc,
      (sxy - sx * sy / n_items)
        / SQRT((sxx - sx * sx / n_items) * (syy - sy * sy / n_items))
        AS corr_qty_disc
    FROM s
    """,
    doc="Exact covariance / Pearson correlation from exact decimal "
    "cross-moments (sum, sum-of-squares, sum-of-products, count): "
    "engine-native corr()/covar_pop() use different one-pass "
    "streaming updates whose rounding differs between engines, so the "
    "portable formulation aggregates the moments exactly (decimal) "
    "and applies ONE shared IEEE expression.  Columns chosen so every "
    "moment's unscaled decimal stays under 2^53 (quantity <= 50, "
    "discount <= 0.1) — the envelope where decimal->double casts are "
    "identically rounded in both engines; price-squared sums overflow "
    "it and drift by 1 ulp.  Same single map-side-combined hash "
    "aggregate as any Q1-style query — five moment sums on one "
    "shuffle.",
)
def agg_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = dec("l_quantity")
    y = dec("l_discount")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n = F.col("n_items")
    cov = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / n
    corr = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / F.sqrt(
        (F.col("sxx") - F.col("sx") * F.col("sx") / n)
        * (F.col("syy") - F.col("sy") * F.col("sy") / n)
    )
    return s.select(
        "l_returnflag",
        "n_items",
        cov.alias("cov_pop_qty_disc"),
        corr.alias("corr_qty_disc"),
    )


@register(
    "join_small_qty_avg_fraction",
    """
    WITH target AS (
      SELECT p_partkey FROM part
      WHERE p_brand = 'Brand#1' AND p_size < 25
    ),
    li AS (
      SELECT l_partkey, l_quantity, l_extendedprice
      FROM lineitem JOIN target ON l_partkey = p_partkey
    ),
    thresh AS (
      SELECT l_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                         AS DOUBLE) / COUNT(*)) AS qty_lim
      FROM li GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / 7.0 AS avg_yearly,
           COUNT(*) AS n_small_lines
    FROM li JOIN thresh USING (l_partkey)
    WHERE l_quantity < qty_lim
    """,
    doc="Small-quantity-order revenue (TPC-H Q17 shape): for a "
    "brand/size slice of parts, revenue from lineitems below 20% of "
    "that part's average quantity, scaled to a yearly figure.  The "
    "correlated AVG decorrelates into a per-part aggregate joined "
    "back — the filtered slice is scanned once and both the "
    "threshold build and the probe reuse it; the threshold table is "
    "parts-sized (broadcasts).  Exact-decimal mean, one IEEE "
    "multiply for the 0.2 fraction, one division for the yearly "
    "scale — hash-identical across engines.",
)
def join_small_qty_avg_fraction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    target = p.where(
        (F.col("p_brand") == "Brand#1") & (F.col("p_size") < 25)
    ).select("p_partkey")
    sel = li.join(
        target, li["l_partkey"] == target["p_partkey"]
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    thresh = sel.groupBy("l_partkey").agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                .cast("double")
                / F.count(F.lit(1))
            )
        ).alias("qty_lim")
    )
    small = sel.join(thresh, "l_partkey").where(
        F.col("l_quantity") < F.col("qty_lim")
    )
    return small.agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                "double"
            )
            / 7.0
        ).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_small_lines"),
    )


@register(
    "agg_sales_opportunity",
    """
    WITH pool AS (
      SELECT c_custkey, c_nationkey, c_acctbal FROM customer
      WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
    ),
    avgbal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS a
      FROM pool WHERE c_acctbal > 0
    ),
    activity AS (
      SELECT o_custkey, COUNT(*) AS n_orders FROM orders
      GROUP BY o_custkey
    ),
    eligible AS (
      SELECT p.c_nationkey, p.c_acctbal
      FROM pool p CROSS JOIN avgbal
      LEFT JOIN activity a ON a.o_custkey = p.c_custkey
      WHERE p.c_acctbal > avgbal.a
        AND COALESCE(a.n_orders, 0) <= 5
    )
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS totacctbal
    FROM eligible GROUP BY c_nationkey
    """,
    doc="Sales-opportunity report (TPC-H Q22 shape, adapted to this "
    "schema: nation pool instead of phone prefixes, and 'at most 5 "
    "orders' instead of none — every synthetic customer has orders): "
    "rich-but-inactive customers per country.  The global average "
    "balance is a 1-row broadcast; the activity counts reduce orders "
    "to customer granularity before the left join; the final rollup "
    "is nation-sized.",
)
def agg_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    pool = c.where(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13)
    ).select("c_custkey", "c_nationkey", "c_acctbal")
    avgbal = pool.where(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("a")
    )
    activity = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    eligible = (
        pool.crossJoin(F.broadcast(avgbal))
        .join(activity, pool["c_custkey"] == activity["o_custkey"], "left")
        .where(
            (F.col("c_acctbal") > F.col("a"))
            & (F.coalesce(F.col("n_orders"), F.lit(0)) <= 5)
        )
    )
    return eligible.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
        .cast("double")
        .alias("totacctbal"),
    )
