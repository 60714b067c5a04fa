"""Entity resolution / record linkage over `part` (SURVEY §2c entity
resolution [X]).

Structured-record dedup is the attribute-table twin of the document
near-dup family: the same block -> fuzzy-verify -> transitive-closure
shape, but blocking on typed attributes (brand + product noun) and
verifying with edit distance on the name instead of shingle Jaccard.
Part names here are "<adjective> <noun>" strings, so records that
share a brand and noun but drift in the adjective ("hot gear" vs
"old gear") are candidate duplicate entities.

Scale design (identical discipline to operators/dedup.py):

* NEVER all-pairs: candidates come from an equi self-join on the
  (brand, noun) block key — O(sum of block^2) with blocks bounded by
  brand x noun cardinality, not O(n^2) over the table;
* the self-join carries only (key, id, name) — verification needs the
  name anyway, everything else stays behind until after the verify
  filter;
* clustering reuses the iterative min-label-propagation operator
  (`operators/dedup.py:364` near_dup_clusters): per round one join +
  one agg over (id, id) pairs, O(log diameter) rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hana_bq_beam_connector_spark.operators.dedup import near_dup_clusters
from hana_bq_beam_connector_spark.queries import register
from hana_bq_beam_connector_spark.sources.files import load_table

_MAX_EDIT = 4  # fuzzy-verify edit-distance ceiling

_DUCK_PAIRS_CTE = f"""pr AS (
      SELECT p_partkey, p_name, p_brand,
             string_split(p_name, ' ')[-1] AS noun
      FROM part
    ),
    pairs AS (
      SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
             CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
      FROM pr a JOIN pr b
        ON a.p_brand = b.p_brand AND a.noun = b.noun
       AND a.p_partkey < b.p_partkey
      WHERE levenshtein(a.p_name, b.p_name) <= {_MAX_EDIT}
    )"""


def _er_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        "p_brand",
        F.element_at(F.split(F.col("p_name"), " "), -1).alias("noun"),
    )
    a = p.select(
        F.col("p_partkey").alias("id_a"),
        F.col("p_name").alias("name_a"),
        F.col("p_brand").alias("brand_a"),
        F.col("noun").alias("noun_a"),
    )
    b = p.select(
        F.col("p_partkey").alias("id_b"),
        F.col("p_name").alias("name_b"),
        F.col("p_brand").alias("brand_b"),
        F.col("noun").alias("noun_b"),
    )
    return (
        a.join(
            b,
            (F.col("brand_a") == F.col("brand_b"))
            & (F.col("noun_a") == F.col("noun_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .withColumn(
            "edit_dist",
            F.levenshtein("name_a", "name_b").cast("bigint"),
        )
        .where(F.col("edit_dist") <= _MAX_EDIT)
        .select("id_a", "id_b", "edit_dist")
    )


@register(
    "er_blocked_pairs",
    f"""
    WITH {_DUCK_PAIRS_CTE}
    SELECT id_a, id_b, edit_dist FROM pairs
    """,
    doc="Record-linkage candidate pairs: block parts on (brand, product "
    "noun), verify with Levenshtein <= 4 on the full name.  The "
    "blocked equi self-join is the scale path — pair space is bounded "
    "per block, never O(n^2) over the table.",
)
def er_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _er_pairs(spark, sf_dir)


@register(
    "er_entity_clusters",
    f"""
    WITH RECURSIVE {_DUCK_PAIRS_CTE},
    e2 AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM e2),
    walk(node, label) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e2.dst, walk.label FROM walk JOIN e2 ON e2.src = walk.node
    ),
    members AS (
      SELECT node AS member_key, MIN(label) AS entity_id
      FROM walk GROUP BY node
    ),
    ents AS (
      SELECT entity_id, COUNT(*) AS n_members
      FROM members GROUP BY entity_id
    )
    SELECT e.entity_id, e.n_members, p.p_name AS canonical_name
    FROM ents e JOIN part p ON p.p_partkey = e.entity_id
    """,
    doc="Canonical entities: transitive closure over the blocked fuzzy "
    "pairs (A~B, B~C must land in ONE entity even when A~C was never "
    "a candidate), deterministic canonical record = min partkey.  "
    "Spark side reuses the iterative min-label-propagation operator "
    "(one join + one agg per round, O(log diameter) rounds); the "
    "oracle replays it as a recursive-CTE reachability walk.",
)
def er_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _er_pairs(spark, sf_dir)
    labels = near_dup_clusters(pairs, id_a="id_a", id_b="id_b")
    ents = labels.groupBy(F.col("label").alias("entity_id")).agg(
        F.count(F.lit(1)).alias("n_members")
    )
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_name").alias("canonical_name")
    )
    # Canonical label IS a partkey (min id in the component), so the
    # survivor's record comes back with one equi-join; the entity list
    # is orders of magnitude smaller than `part`, so Catalyst/AQE
    # broadcasts it.
    return ents.join(
        p, ents.entity_id == p.p_partkey, "inner"
    ).select("entity_id", "n_members", "canonical_name")
