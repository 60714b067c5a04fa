"""Privacy / governance audits over `customer` (SURVEY §2c privacy [X]).

A training-data platform that ingests user-derived tables needs
re-identification-risk tooling next to its quality tooling: k-anonymity
audits (which quasi-identifier combinations isolate individuals),
generalization ladders (how much coarsening buys how much anonymity),
and l-diversity checks (does a small group also expose its sensitive
attribute).  The reference has no privacy surface (it copies raw HANA
rows, `HanaToDBRow.java:79-112`); this is engine extension.

Scale design:

* every audit is ONE hash-aggregate over the quasi-identifier columns —
  the fact table shuffles once on the QI key, partial aggregation
  reduces map-side, and group counts (not rows) move;
* the generalization ladder is a single ROLLUP pass: Spark expands the
  grouping sets map-side, so all four generalization levels cost one
  shuffle of partial counts, not four scans;
* nothing collects to the driver; reports are DataFrames.

Determinism: group sizes and distinct counts are exact integers; the
only doubles are single IEEE divisions of exact operands (safe-share
ratios), identical bit-for-bit across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hana_bq_beam_connector_spark.queries import register
from hana_bq_beam_connector_spark.sources.files import load_table

_K = 5  # minimum safe group size
_L = 3  # minimum sensitive-value diversity

# Quasi-identifier projection shared by all three audits: nation,
# market segment, and the account-balance thousand-band.  FLOOR of one
# IEEE division of identical operands is engine-stable.
_QI_SQL = """
    SELECT c_nationkey, c_mktsegment,
           CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band
    FROM customer
"""


def _qi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
    )


@register(
    "privacy_k_anonymity_audit",
    f"""
    WITH qi AS ({_QI_SQL}),
    g AS (
      SELECT c_nationkey, c_mktsegment, bal_band, COUNT(*) AS n_rows
      FROM qi GROUP BY c_nationkey, c_mktsegment, bal_band
    )
    SELECT c_nationkey, c_mktsegment, bal_band, n_rows
    FROM g WHERE n_rows < {_K}
    """,
    doc=f"k-anonymity audit: quasi-identifier groups (nation, segment, "
    f"balance band) smaller than k={_K} — each output row is a "
    "re-identifiable cohort that generalization or suppression must "
    "fix before release.  One hash-aggregate; only violating groups "
    "surface.",
)
def privacy_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = (
        _qi(spark, sf_dir)
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    return g.where(F.col("n_rows") < _K)


@register(
    "privacy_generalization_ladder",
    f"""
    WITH qi AS ({_QI_SQL}),
    lv AS (
      SELECT CAST(0 AS BIGINT) AS gid, COUNT(*) AS n
        FROM qi GROUP BY c_nationkey, c_mktsegment, bal_band
      UNION ALL
      SELECT CAST(1 AS BIGINT), COUNT(*)
        FROM qi GROUP BY c_nationkey, c_mktsegment
      UNION ALL
      SELECT CAST(3 AS BIGINT), COUNT(*) FROM qi GROUP BY c_nationkey
      UNION ALL
      SELECT CAST(7 AS BIGINT), COUNT(*) FROM qi
    )
    SELECT gid, COUNT(*) AS n_groups,
           MIN(n) AS min_group_size,
           CAST(SUM(CASE WHEN n >= {_K} THEN n ELSE 0 END) AS BIGINT)
             AS safe_rows,
           CAST(CAST(SUM(CASE WHEN n >= {_K} THEN n ELSE 0 END) AS BIGINT)
                AS DOUBLE)
             / CAST(CAST(SUM(n) AS BIGINT) AS DOUBLE) AS safe_share
    FROM lv GROUP BY gid
    """,
    doc="Generalization ladder in ONE rollup pass: for each "
    "generalization level (full QI -> drop balance band -> drop "
    "segment -> fully general), the group count, the worst (minimum) "
    "group size, and the share of rows already k-anonymous.  Answers "
    "'how much coarsening buys how much anonymity' without four "
    "scans: Spark expands the ROLLUP grouping sets map-side, one "
    "shuffle of partial counts.  gid is Spark's grouping_id "
    "(0, 1, 3, 7 for the four rollup prefixes), replayed literally "
    "by the oracle's UNION ALL ladder.",
)
def privacy_generalization_ladder(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    sizes = (
        _qi(spark, sf_dir)
        .rollup("c_nationkey", "c_mktsegment", "bal_band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.grouping_id().alias("gid"),
        )
    )
    safe_n = F.sum(F.when(F.col("n") >= _K, F.col("n")).otherwise(0))
    return sizes.groupBy("gid").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("n").alias("min_group_size"),
        safe_n.alias("safe_rows"),
        (safe_n.cast("double") / F.sum("n").cast("double")).alias(
            "safe_share"
        ),
    )


@register(
    "privacy_l_diversity",
    f"""
    WITH qi AS ({_QI_SQL}),
    g AS (
      SELECT c_nationkey, bal_band,
             COUNT(*) AS n_rows,
             COUNT(DISTINCT c_mktsegment) AS n_sensitive
      FROM qi GROUP BY c_nationkey, bal_band
    )
    SELECT c_nationkey, bal_band, n_rows, n_sensitive
    FROM g WHERE n_sensitive < {_L}
    """,
    doc=f"l-diversity audit: treating the market segment as the "
    "sensitive attribute, flag quasi-identifier groups (nation, "
    f"balance band) carrying fewer than l={_L} distinct sensitive "
    "values — groups where k-anonymity still leaks the attribute "
    "itself (homogeneity attack).  COUNT DISTINCT inside the same "
    "single aggregate pass.",
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = (
        _qi(spark, sf_dir)
        .groupBy("c_nationkey", "bal_band")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("c_mktsegment").alias("n_sensitive"),
        )
    )
    return g.where(F.col("n_sensitive") < _L)


@register(
    "privacy_t_closeness",
    """
    WITH qi AS (
      SELECT c_mktsegment,
             CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band
      FROM customer
    ),
    cell AS (
      SELECT c_mktsegment, bal_band, COUNT(*) AS n_cb
      FROM qi GROUP BY 1, 2
    ),
    gdist AS (SELECT bal_band, COUNT(*) AS n_gb FROM qi GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(n_gb) AS BIGINT) AS n_total,
             CAST(COUNT(*) AS BIGINT) AS m_bands
      FROM gdist
    ),
    grid AS (
      SELECT c.c_mktsegment, g.bal_band,
             COALESCE(x.n_cb, 0) AS n_cb, g.n_gb
      FROM (SELECT DISTINCT c_mktsegment FROM qi) c
      CROSS JOIN gdist g
      LEFT JOIN cell x ON x.c_mktsegment = c.c_mktsegment
                      AND x.bal_band = g.bal_band
    ),
    cum AS (
      SELECT c_mktsegment, bal_band,
        SUM(n_cb) OVER (PARTITION BY c_mktsegment ORDER BY bal_band)
          AS cum_c,
        SUM(n_gb) OVER (PARTITION BY c_mktsegment ORDER BY bal_band)
          AS cum_g,
        SUM(n_cb) OVER (PARTITION BY c_mktsegment) AS n_class
      FROM grid
    )
    SELECT c_mktsegment,
      CAST(MAX(n_class) AS BIGINT) AS n_rows,
      CAST(SUM(ABS(CAST(cum_c AS DECIMAL(19,0)) * t.n_total
                 - CAST(cum_g AS DECIMAL(19,0)) * n_class))
           AS DOUBLE)
        / (CAST(MAX(n_class) AS DOUBLE) * CAST(t.n_total AS DOUBLE)
           * (CAST(t.m_bands AS DOUBLE) - 1)) AS emd_t
    FROM cum CROSS JOIN tot t
    GROUP BY c_mktsegment, t.n_total, t.m_bands
    """,
    doc="t-closeness audit — the third rung of the k-anonymity / "
    "l-diversity / t-closeness ladder: per quasi-identifier class "
    "(market segment), the Earth Mover's Distance between the "
    "class's SENSITIVE-attribute distribution (ordered balance "
    "bands) and the global one.  For an ordered attribute EMD is "
    "the mean |cumulative difference|; kept EXACT by "
    "cross-multiplying integer cumulative counts (|cum_c·N − "
    "cum_g·n_class| as DECIMAL products — no per-class rational "
    "division until the ONE closing IEEE expression).  Classes "
    "whose emd_t exceeds the release threshold leak attribute "
    "skew even when k-anonymous and l-diverse.  Scale: two hash "
    "aggregates + a windows pass over an O(classes × bands) grid "
    "(5 × 11 here) — the fact table is scanned once.",
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    qi = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias(
            "bal_band"
        ),
    )
    cell = qi.groupBy("c_mktsegment", "bal_band").agg(
        F.count(F.lit(1)).alias("n_cb")
    )
    glob = qi.groupBy("bal_band").agg(F.count(F.lit(1)).alias("n_gb"))
    tot = glob.agg(
        F.sum("n_gb").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).cast("bigint").alias("m_bands"),
    )
    classes = qi.select("c_mktsegment").distinct()
    grid = (
        classes.crossJoin(F.broadcast(glob))
        .join(cell, ["c_mktsegment", "bal_band"], "left")
        .select(
            "c_mktsegment",
            "bal_band",
            F.coalesce(F.col("n_cb"), F.lit(0)).alias("n_cb"),
            "n_gb",
        )
    )
    w_cum = (
        Window.partitionBy("c_mktsegment")
        .orderBy("bal_band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("c_mktsegment")
    cum = grid.select(
        "c_mktsegment",
        "bal_band",
        F.sum("n_cb").over(w_cum).alias("cum_c"),
        F.sum("n_gb").over(w_cum).alias("cum_g"),
        F.sum("n_cb").over(w_all).alias("n_class"),
    )
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("c_mktsegment", "n_total", "m_bands")
        .agg(
            F.max("n_class").cast("bigint").alias("n_rows"),
            F.sum(
                F.abs(
                    d19("cum_c") * F.col("n_total")
                    - d19("cum_g") * F.col("n_class")
                )
            ).alias("absdiff"),
        )
        .select(
            "c_mktsegment",
            "n_rows",
            F.expr(
                "CAST(absdiff AS DOUBLE)"
                " / (CAST(n_rows AS DOUBLE) * CAST(n_total AS DOUBLE)"
                " * (CAST(m_bands AS DOUBLE) - 1))"
            ).alias("emd_t"),
        )
    )
