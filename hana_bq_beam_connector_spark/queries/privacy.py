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
