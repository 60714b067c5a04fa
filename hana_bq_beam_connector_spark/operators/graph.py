"""Graph operators over edge lists (LLM-data surface extension).

Near-dup clustering (operators/dedup.near_dup_clusters) already walks
connected components; this module adds the other two graph primitives
a corpus-curation pipeline reaches for:

* PageRank — rank documents/sources by link or co-occurrence
  structure (e.g. quality-propagate over a citation graph);
* triangle counting — local clustering density, the standard
  spam-farm / boilerplate-cluster signal.

Both are EXACT and deterministic: PageRank runs in integer
micro-units with integer division (sums of integers are
associativity-independent, so Spark's partial aggregation order
cannot perturb the result — the same trick the exact-variance
queries use for doubles via decimals), which makes a bit-exact
DuckDB oracle expressible as unrolled CTE iterations.

The reference has no graph surface at all (SURVEY §2b); this is [X]
extension surface like the dedup/similarity stack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hana_bq_beam_connector_spark.operators._common import (
    persist_reused as _persist,
)
from hana_bq_beam_connector_spark.operators._common import (
    plan_reset as _plan_reset,
)

PR_UNIT = 1_000_000  # PageRank fixed-point scale (micro-units)


def symmetrize(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected edge list → both directions, distinct."""
    fwd = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    rev = edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    return fwd.unionByName(rev).distinct()


def pagerank_integer(
    edges: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Exact fixed-point PageRank over a symmetric edge list.

    ``pr' = (1 - d) + d * Σ_in pr/deg`` evaluated in integer
    micro-units: contributions are ``pr div deg`` and the damping step
    is ``(damping_pct * Σ) div 100`` — all BIGINT, so the result is
    independent of partial-aggregation order and bit-reproducible
    across engines (the float formulation is not: IEEE addition is
    non-associative, and a 1000-executor sum order differs run to
    run).  The ``div`` truncation loses < 1e-6 of mass per hop —
    irrelevant for ranking, decisive for testability.

    Scale shape: degree table and ranks are (id, int) pairs; each
    iteration is one equi-join on src + one groupBy dst — two
    bounded-width shuffles per hop, text/payloads never enter.  Ranks
    lineage grows linearly per hop; every 5th hop the plan is reset to
    a leaf — ``checkpoint_dir`` picks reliable ``checkpoint`` (cluster,
    survives executor loss) vs ``localCheckpoint`` (default, local[*]).
    Every node of a symmetric edge list has deg ≥ 1 — no dangling-
    mass term needed.
    """
    e = _persist(edges.select("src", "dst"))
    deg = _persist(e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")))
    pr = deg.select(
        F.col("src").alias("node_id"), F.lit(PR_UNIT).cast("long").alias("pr")
    )
    base = (100 - damping_pct) * PR_UNIT // 100
    for it in range(iters):
        contrib = (
            e.join(pr, e["src"] == pr["node_id"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("node_id"),
                F.expr("pr div deg").alias("c"),
            )
        )
        pr = contrib.groupBy("node_id").agg(
            (
                F.lit(base)
                + F.expr(f"({damping_pct} * sum(c)) div 100")
            ).alias("pr")
        )
        if (it + 1) % 5 == 0 and it + 1 < iters:
            pr = _plan_reset(pr, checkpoint_dir)
    return pr


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count of an undirected graph.

    Canonicalizes to ``src < dst``, re-orients every edge from its
    lower-(degree, id) endpoint to the higher one (Schank & Wagner),
    then counts paths u→v→w that close with edge (u, w): two
    equi-joins, never a cartesian.  Each triangle is enumerated
    exactly once from its minimum corner, so the COUNT is identical
    to the id-oriented form (the oracle keeps its one-line SQL) —
    but the wedge join pivots on each wedge's lowest-degree corner,
    bounding Σ out_deg² by O(E^1.5) under any skew instead of
    letting hub vertices fan out (the id-oriented form measured
    15.6x at the round-8 sf10 sweep on the co-supply graph).
    """
    canon = _persist(
        edges.where(F.col("src") < F.col("dst")).select("src", "dst").distinct()
    )
    sym = canon.union(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("node_id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    e1 = canon.join(
        deg.select(F.col("node_id").alias("src"), F.col("deg").alias("ds")),
        "src",
    ).join(
        deg.select(F.col("node_id").alias("dst"), F.col("deg").alias("dd")),
        "dst",
    )
    lo_first = (F.col("ds") < F.col("dd")) | (
        (F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst"))
    )
    oriented = _persist(
        e1.select(
            F.when(lo_first, F.col("src")).otherwise(F.col("dst")).alias(
                "osrc"
            ),
            F.when(lo_first, F.col("dst")).otherwise(F.col("src")).alias(
                "odst"
            ),
        )
    )
    uv = oriented.select(F.col("osrc").alias("u"), F.col("odst").alias("v"))
    vw = oriented.select(F.col("osrc").alias("v"), F.col("odst").alias("w"))
    uw = oriented.select(F.col("osrc").alias("u"), F.col("odst").alias("w"))
    return (
        uv.join(vw, "v")
        .join(uw, ["u", "w"])
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
