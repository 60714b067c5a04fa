"""Dataset-profiling / multi-criteria analytics (SURVEY §2c
aggregation [X] extensions).

The reference's only schema introspection is the driver-side catalog
query (`HanaToBQ.java:104-143`); column profiling, skyline queries and
score-tier segmentation are engine extensions.

Scale notes per query are in each docstring; the common theme is that
anything "global" (a frontier, a quantile tier) is first reduced
per-group or per-partition so the global step sees a tiny input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hana_bq_beam_connector_spark.queries import register
from hana_bq_beam_connector_spark.queries._util import sum_dec_as_double
from hana_bq_beam_connector_spark.sources.files import load_table


@register(
    "agg_pareto_frontier",
    """
    WITH best AS (
      SELECT p_retailprice, MAX(p_size) AS p_size
      FROM part GROUP BY p_retailprice
    )
    SELECT p_retailprice, p_size FROM best b
    WHERE NOT EXISTS (
      SELECT 1 FROM best o
      WHERE o.p_retailprice < b.p_retailprice AND o.p_size >= b.p_size
    )
    """,
    doc="2-D Pareto frontier (skyline): parts optimal on (min "
    "retailprice, max size).  Exact two-phase plan: (1) reduce to the "
    "max size per distinct price — one hash shuffle, after which any "
    "same-price-smaller-size point is gone; (2) a running-max window "
    "over the price-sorted survivors keeps a point only if every "
    "cheaper price has a strictly smaller max size.  The global sort "
    "in phase 2 touches ONE ROW PER DISTINCT PRICE, not the fact "
    "table — the naive NOT-EXISTS dominance check the oracle runs is "
    "O(n²) and would never survive scale.",
)
def agg_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    best = p.groupBy("p_retailprice").agg(F.max("p_size").alias("p_size"))
    w = (
        Window.orderBy(F.col("p_retailprice").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run_max = F.max("p_size").over(w)
    return best.withColumn("__m", run_max).where(
        F.col("__m").isNull() | (F.col("__m") < F.col("p_size"))
    ).drop("__m")


@register(
    "agg_rfm_segments",
    """
    WITH rfm AS (
      SELECT o_custkey AS custkey,
             MAX(o_orderdate) AS last_order,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS monetary
      FROM orders GROUP BY o_custkey
    ),
    tiles AS (
      SELECT custkey,
             NTILE(4) OVER (ORDER BY last_order DESC, custkey) AS r_tile,
             NTILE(4) OVER (ORDER BY frequency DESC, custkey) AS f_tile,
             NTILE(4) OVER (ORDER BY monetary DESC, custkey) AS m_tile
      FROM rfm
    )
    SELECT r_tile, f_tile, m_tile, COUNT(*) AS n_customers
    FROM tiles GROUP BY r_tile, f_tile, m_tile
    """,
    doc="RFM segmentation: per-customer recency / frequency / monetary "
    "from one orders aggregate, NTILE(4) tier per axis (ties broken by "
    "custkey so tile assignment is deterministic), then segment "
    "counts.  The NTILE global sorts run over ONE ROW PER CUSTOMER "
    "(already reduced), not over orders; at 100 TB the same tiering is "
    "done with approx-quantile thresholds broadcast as a filter — the "
    "pattern curation_quality_quantile_sketch demonstrates.",
)
def agg_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    rfm = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        sum_dec_as_double("o_totalprice", "monetary"),
    )
    tiles = rfm.select(
        "custkey",
        F.ntile(4)
        .over(Window.orderBy(F.col("last_order").desc(), "custkey"))
        .alias("r_tile"),
        F.ntile(4)
        .over(Window.orderBy(F.col("frequency").desc(), "custkey"))
        .alias("f_tile"),
        F.ntile(4)
        .over(Window.orderBy(F.col("monetary").desc(), "custkey"))
        .alias("m_tile"),
    )
    return tiles.groupBy("r_tile", "f_tile", "m_tile").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@register(
    "agg_profile_columns",
    """
    WITH s AS (
      SELECT 'o_orderstatus' AS col_name, o_orderstatus AS val FROM orders
      UNION ALL
      SELECT 'o_orderpriority', o_orderpriority FROM orders
      UNION ALL
      SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
    )
    SELECT col_name,
           COUNT(*) AS n_rows,
           COUNT(val) AS n_nonnull,
           COUNT(DISTINCT val) AS n_distinct,
           MIN(val) AS min_val,
           MAX(val) AS max_val
    FROM s GROUP BY col_name
    """,
    doc="Column-profiling operator (the `df.summary()` engine surface "
    "as an oracle-checked query): one unpivoted pass computes row / "
    "non-null / exact-distinct counts and lexicographic min-max per "
    "column.  stack() inflates rows ×3 but map-side partial "
    "aggregation collapses them before the single shuffle; at 100 TB "
    "swap COUNT(DISTINCT) for approx_count_distinct (HLL, "
    "one-pass, mergeable — sketch_* queries show the machinery) and "
    "the profile becomes shuffle-light regardless of column count.",
)
def agg_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    stacked = o.select(
        F.expr(
            "stack(3, "
            "'o_orderstatus', o_orderstatus, "
            "'o_orderpriority', o_orderpriority, "
            "'o_custkey', CAST(o_custkey AS STRING)"
            ") AS (col_name, val)"
        )
    )
    return stacked.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("val").alias("n_nonnull"),
        F.countDistinct("val").alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )
