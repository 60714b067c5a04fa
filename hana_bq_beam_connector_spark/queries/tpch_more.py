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

from hana_bq_beam_connector_spark.queries import register
from hana_bq_beam_connector_spark.queries._util import (
    SQL_SUM_DEC,
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
