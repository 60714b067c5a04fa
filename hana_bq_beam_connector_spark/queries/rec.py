"""Recommendation / co-occurrence-model queries (SURVEY §2c
recommendation [X] — NEW group, round 5).

The serving-side layer above graph_copurchase_pairs' raw counts: the
association measures (lift, confidence, Jaccard) a recommender ranks
by, per-anchor top-k neighbor lists, user-level candidate generation
(the collaborative-filtering join), and the coverage/popularity-bias
audit run before shipping a model.  Baskets are TPC-H orders; items
are parts.

Determinism doctrine: every measure is a SINGLE IEEE division (or
a division of exact int64 products) of exact BIGINT co-occurrence
counts — no logs, no accumulated float sums; top-k lists tie-break on
(count DESC, item key ASC) so rankings are total orders.  Lift's
integer products are bounded by N² (N = distinct baskets): past
N ~ 3e9 a raise_error guard fires in every session mode rather than
letting int64 wrap.

Scale shapes: baskets materialize ONCE as per-order sorted item
arrays (one exchange by order key), pairs expand in-partition from
each array (fan-out bounded by basket size squared — baskets are
small; a pathological mega-basket is the salting/AQE case), pair
counts partial-aggregate map-side, item supports explode from the
same pinned frame, and user-level candidate generation joins the
user's items to the BOUNDED top-k neighbor lists (3 candidate edges
per owned item), never to the full pair table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hana_bq_beam_connector_spark.queries import register
from hana_bq_beam_connector_spark.sources.files import load_table

# Shared SQL building blocks (DuckDB).  op = distinct (basket, item);
# supp = per-item basket support; pairs = co-occurrence counts with
# both items' supports attached.
_SQL_OP = "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem"
_SQL_SUPP = f"""
  SELECT l_partkey AS item, CAST(COUNT(*) AS BIGINT) AS n_item
  FROM ({_SQL_OP}) GROUP BY 1
"""
_SQL_PAIRS = f"""
  SELECT a.l_partkey AS p1, b.l_partkey AS p2,
         CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM ({_SQL_OP}) a JOIN ({_SQL_OP}) b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
"""

_N_BASKET_GUARD = 3_000_000_000  # N^2 must stay inside int64


def _baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hana_bq_beam_connector_spark.operators._common import (
        persist_reused,
    )

    # Basket-array reshape (r11, guide §2.3/§2.4): ONE exchange by
    # l_orderkey with an in-agg collect_set replaces the former
    # distinct-(basket, item) frame that the pair build then
    # re-shuffled by l_orderkey TWICE (both self-join sides; measured
    # 93 CPU-s of the 250 CPU-s rec_item_lift_topk total at sf0.1).
    # Pairs now expand IN-PARTITION from the sorted item array
    # (C(b,2) ≤ C(7,2) structs per TPC-H basket — bounded by basket
    # size, the same fan-out the self-join produced), and supports
    # explode from the same pinned frame.  sort_array gives p1 < p2
    # by construction.  Stage-checkpointed: every query in the family
    # reads this frame from 2–4 branches.
    return persist_reused(
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("items"))
    )


def _supp(baskets: DataFrame) -> DataFrame:
    return (
        baskets.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_item"))
    )


# All unordered in-basket pairs (p1 < p2) from the sorted item array.
# explode_outer + IS NOT NULL instead of a plain explode: the outer
# generator is exempt from InferFiltersFromGenerate, so the pair
# array is built once per basket instead of twice (see
# operators/_common.explode_nonempty), and single-item baskets (empty
# pair array) drop via the null filter.
_PAIR_ARR = (
    "flatten(transform(items, (x, i) -> "
    "transform(slice(items, i + 2, size(items)), "
    "y -> named_struct('p1', x, 'p2', y))))"
)


def _pairs(baskets: DataFrame) -> DataFrame:
    return (
        baskets.select(F.explode_outer(F.expr(_PAIR_ARR)).alias("pr"))
        .where(F.col("pr").isNotNull())
        .select("pr.p1", "pr.p2")
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
    )


def _sym(pairs: DataFrame, anchor: str, other: str) -> DataFrame:
    """Symmetrize the aggregated pair frame IN-PARTITION: each (p1,
    p2, n_ab) row explodes into both directions from a 2-element
    struct array — one narrow generator over ONE evaluation of the
    pair aggregation.  The former UNION ALL spelling evaluated the
    whole pairs subtree (baskets-cache scan + pair explode + count
    shuffle) once PER BRANCH: broadcast threads kicked both branches
    off concurrently, and the r11 stage profile showed the two
    duplicate exchanges side by side (~5.4 CPU-s each at sf0.1).
    Row multiset is identical (same two rows per pair, order
    immaterial to the joins/windows downstream); the oracle keeps
    the UNION ALL spelling.  explode (not _outer): the array is a
    literal 2-struct constructor over three plain columns, so the
    InferFiltersFromGenerate re-evaluation trap explode_nonempty
    documents does not bite — there is no bound intermediate to
    re-inline, and the inferred filter folds to true."""
    return pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("p1").alias(anchor),
                    F.col("p2").alias(other),
                    F.col("n_ab"),
                ),
                F.struct(
                    F.col("p2").alias(anchor),
                    F.col("p1").alias(other),
                    F.col("n_ab"),
                ),
            )
        ).alias("e")
    ).select(f"e.{anchor}", f"e.{other}", "e.n_ab")


@register(
    "rec_item_lift_topk",
    f"""
    WITH supp AS ({_SQL_SUPP}),
    pairs AS ({_SQL_PAIRS}),
    tot AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n
            FROM lineitem),
    scored AS (
      SELECT p.p1, p.p2, p.n_ab, sa.n_item AS n_a, sb.n_item AS n_b,
        CAST(p.n_ab * t.n AS DOUBLE)
          / CAST(sa.n_item * sb.n_item AS DOUBLE) AS lift
      FROM pairs p
      JOIN supp sa ON sa.item = p.p1
      JOIN supp sb ON sb.item = p.p2
      CROSS JOIN tot t
      WHERE p.n_ab >= 3
    )
    SELECT p1, p2, n_ab, n_a, n_b, lift,
           CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, ROW_NUMBER() OVER (
            ORDER BY lift DESC, p1, p2) AS rnk
          FROM scored)
    WHERE rnk <= 20
    """,
    doc="Association-rule lift: top-20 item pairs by "
    "lift = (n_ab · N) / (n_a · n_b) with min-support 3 — the "
    "'surprisingly often together' ranking that raw co-occurrence "
    "counts (graph_copurchase_pairs) miss because they just rank "
    "popular items.  Both integer products are exact int64 (bounded "
    "by N²; a raise_error guard fires past N ~ 3e9 baskets in every "
    "session mode) and the lift is ONE IEEE division of them.  "
    "Supports ride the same distinct (basket, item) frame as the "
    "pairs; the 1-row basket total broadcasts.",
)
def rec_item_lift_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _baskets(spark, sf_dir)
    supp = _supp(b)
    pairs = _pairs(b).where(F.col("n_ab") >= 3)
    # one row per distinct l_orderkey by construction, so the basket
    # count IS COUNT(DISTINCT l_orderkey)
    tot = b.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    sa = supp.alias("sa")
    sb = supp.alias("sb")
    scored = (
        pairs.join(sa, F.col("sa.item") == F.col("p1"))
        .join(sb, F.col("sb.item") == F.col("p2"))
        .crossJoin(F.broadcast(tot))
        .select(
            "p1",
            "p2",
            "n_ab",
            F.col("sa.n_item").alias("n_a"),
            F.col("sb.n_item").alias("n_b"),
            F.expr(
                f"CASE WHEN n > {_N_BASKET_GUARD} THEN "
                "raise_error('rec_item_lift_topk: n_ab*N outgrows "
                "int64 past ~3e9 baskets; scale lift to ppm integers "
                "first') ELSE CAST(n_ab * n AS DOUBLE) "
                "/ CAST(sa.n_item * sb.n_item AS DOUBLE) END"
            ).alias("lift"),
        )
    )
    w = Window.orderBy(F.col("lift").desc(), "p1", "p2")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= 20)
        .select("p1", "p2", "n_ab", "n_a", "n_b", "lift", "rnk")
    )


# Symmetrized neighbor lists: every pair contributes both directions,
# each anchor keeps its top-3 neighbors by Jaccard.
_SQL_NEIGHBORS = f"""
  WITH supp AS ({_SQL_SUPP}),
  pairs AS ({_SQL_PAIRS}),
  sym AS (
    SELECT p1 AS anchor, p2 AS neighbor, n_ab FROM pairs
    UNION ALL
    SELECT p2 AS anchor, p1 AS neighbor, n_ab FROM pairs
  ),
  scored AS (
    SELECT s.anchor, s.neighbor, s.n_ab,
      sa.n_item AS n_anchor, sb.n_item AS n_neighbor,
      CAST(s.n_ab AS DOUBLE)
        / CAST(sa.n_item + sb.n_item - s.n_ab AS DOUBLE) AS jaccard
    FROM sym s
    JOIN supp sa ON sa.item = s.anchor
    JOIN supp sb ON sb.item = s.neighbor
  )
  SELECT anchor, neighbor, n_ab, n_anchor, n_neighbor, jaccard,
         CAST(rnk AS BIGINT) AS rnk
  FROM (SELECT *, ROW_NUMBER() OVER (
          PARTITION BY anchor
          ORDER BY jaccard DESC, n_ab DESC, neighbor) AS rnk
        FROM scored)
  WHERE rnk <= 3
"""


def _neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hana_bq_beam_connector_spark.operators._common import (
        persist_reused,
    )

    b = _baskets(spark, sf_dir)
    supp = persist_reused(_supp(b))  # read twice (both join sides)
    sym = _sym(_pairs(b), "anchor", "neighbor")
    sa = supp.alias("sa")
    sb = supp.alias("sb")
    scored = (
        sym.join(sa, F.col("sa.item") == F.col("anchor"))
        .join(sb, F.col("sb.item") == F.col("neighbor"))
        .select(
            "anchor",
            "neighbor",
            "n_ab",
            F.col("sa.n_item").alias("n_anchor"),
            F.col("sb.n_item").alias("n_neighbor"),
            F.expr(
                "CAST(n_ab AS DOUBLE)"
                " / CAST(sa.n_item + sb.n_item - n_ab AS DOUBLE)"
            ).alias("jaccard"),
        )
    )
    w = Window.partitionBy("anchor").orderBy(
        F.col("jaccard").desc(), F.col("n_ab").desc(), "neighbor"
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= 3)
        .select(
            "anchor",
            "neighbor",
            "n_ab",
            "n_anchor",
            "n_neighbor",
            "jaccard",
            "rnk",
        )
    )


@register(
    "rec_item_jaccard_neighbors",
    _SQL_NEIGHBORS,
    doc="Item-item nearest-neighbor lists: each part's top-3 "
    "co-purchase neighbors by basket-set Jaccard "
    "n_ab / (n_a + n_b − n_ab) — the normalized similarity a "
    "memory-based recommender serves from (raw counts favor popular "
    "items; Jaccard divides that bias out).  The inclusion-exclusion "
    "denominator stays integer; the similarity is ONE IEEE division; "
    "ranking ties break (n_ab DESC, neighbor ASC) so every list is a "
    "total order.  Pairs symmetrize via UNION ALL (no second join) "
    "and the per-anchor window runs on the already-reduced pair "
    "frame.  This materialized top-k table is the bounded candidate "
    "source for rec_user_candidates and the audit input for "
    "rec_coverage_popularity_bias.",
)
def rec_item_jaccard_neighbors(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _neighbors(spark, sf_dir)


@register(
    "rec_also_bought_confidence",
    f"""
    WITH supp AS ({_SQL_SUPP}),
    pairs AS ({_SQL_PAIRS}),
    anchors AS (
      SELECT item, n_item,
             ROW_NUMBER() OVER (ORDER BY n_item DESC, item) AS prnk
      FROM supp QUALIFY prnk <= 10
    ),
    sym AS (
      SELECT p1 AS anchor, p2 AS other, n_ab FROM pairs
      UNION ALL
      SELECT p2 AS anchor, p1 AS other, n_ab FROM pairs
    )
    SELECT a.item AS anchor, CAST(a.n_item AS BIGINT) AS n_anchor,
           s.other, s.n_ab,
           CAST(s.n_ab AS DOUBLE) / CAST(a.n_item AS DOUBLE)
             AS confidence,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT s.*, ROW_NUMBER() OVER (
               PARTITION BY s.anchor
               ORDER BY s.n_ab DESC, s.other) AS rnk
      FROM sym s JOIN anchors a2 ON a2.item = s.anchor
    ) s JOIN anchors a ON a.item = s.anchor
    WHERE rnk <= 5
    """,
    doc="'Customers who bought X also bought …': for the 10 most "
    "popular items, the top-5 companions by confidence "
    "P(other | anchor) = n_ab / n_anchor — the serving query behind "
    "the product-page widget.  Confidence is ONE IEEE division of "
    "exact counts; companion ranking is integer (n_ab DESC, key "
    "ASC).  The anchor set is a 10-row broadcast, so the pair table "
    "is semi-join-pruned to anchors before any window runs.",
)
def rec_also_bought_confidence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    b = _baskets(spark, sf_dir)
    supp = _supp(b)
    wp = Window.orderBy(F.col("n_item").desc(), "item")
    anchors = (
        supp.withColumn("prnk", F.row_number().over(wp))
        .where(F.col("prnk") <= 10)
        .select("item", "n_item")
    )
    sym = _sym(_pairs(b), "anchor", "other")
    joined = sym.join(
        F.broadcast(anchors), F.col("item") == F.col("anchor")
    )
    w = Window.partitionBy("anchor").orderBy(
        F.col("n_ab").desc(), "other"
    )
    return (
        joined.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= 5)
        .select(
            "anchor",
            F.col("n_item").cast("bigint").alias("n_anchor"),
            "other",
            "n_ab",
            F.expr(
                "CAST(n_ab AS DOUBLE) / CAST(n_item AS DOUBLE)"
            ).alias("confidence"),
            "rnk",
        )
    )


@register(
    "rec_user_candidates",
    f"""
    WITH op AS ({_SQL_OP}),
    owned AS (
      SELECT DISTINCT o.o_custkey, l.l_partkey AS item
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    nb AS ({_SQL_NEIGHBORS}),
    cand AS (
      SELECT w.o_custkey, n.neighbor AS item,
        CAST(COUNT(*) AS BIGINT) AS n_evidence,
        CAST(SUM(n.n_ab) AS BIGINT) AS evidence_weight
      FROM owned w JOIN nb n ON n.anchor = w.item
      GROUP BY 1, 2
    ),
    new_items AS (
      SELECT c.* FROM cand c
      ANTI JOIN owned w
        ON w.o_custkey = c.o_custkey AND w.item = c.item
    )
    SELECT o_custkey, item, n_evidence, evidence_weight,
           CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY o_custkey
            ORDER BY n_evidence DESC, evidence_weight DESC, item) AS rnk
          FROM new_items)
    WHERE rnk <= 3
    """,
    doc="User-level candidate generation — the collaborative-"
    "filtering join: each customer's owned items pull in their top-3 "
    "Jaccard neighbors (a BOUNDED 3-edges-per-item candidate table, "
    "never the full pair matrix), candidates aggregate integer "
    "evidence (how many owned items endorse it, total co-occurrence "
    "weight), already-owned items anti-join out, and each customer "
    "keeps 3 novel recommendations.  All scoring is exact integers; "
    "ranking ties break on the item key.  Scale: candidate volume is "
    "O(items-per-user × 3) rows per user — linear in the purchase "
    "log, independent of catalog size.",
)
def rec_user_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from concurrent.futures import ThreadPoolExecutor

    from hana_bq_beam_connector_spark.operators._common import (
        persist_reused,
    )

    o = load_table(spark, sf_dir, "orders")
    b = _baskets(spark, sf_dir)
    # owned rides the pinned basket frame (r11): join orders to the
    # per-order item array and explode, instead of re-scanning
    # lineitem and shuffling the full (custkey, item) log into a
    # second distinct from scratch — lineitem is read once per query
    # family, and the join carries one array row per order.
    # Pinned (r11 session 3): TWO branches consume it — the candidate
    # join below and the left-anti novelty filter — and broadcast
    # threads start both concurrently, so without the pin the
    # baskets-join + explode + distinct subtree evaluated twice (the
    # stage profile showed the duplicate 12.3 MB distinct exchanges
    # side by side, ~13.5 CPU-s each at sf0.1).  The pinned frame is
    # (custkey, item) ids only — linear in the purchase log.
    #
    # r12 (guide §2.4/§2.6, the round-11 verdict's serial-tail item):
    # the dedup exchange is keyed on "item" alone — hashpartitioning
    # on a subset of the distinct keys still satisfies the distinct's
    # clustering requirement, and it leaves the pinned frame
    # partitioned EXACTLY as the candidate join (on item = anchor)
    # needs, so the join consumes the cache without re-shuffling the
    # purchase log.
    owned_frame = (
        b.join(
            o.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("o_custkey", F.explode("items").alias("item"))
        .repartition("item")
        .distinct()
    )
    # owned and the neighbor table both depend only on the pinned
    # baskets frame, so their materialization jobs (owned's pin count,
    # _neighbors' supp pin count) are independent — run them from two
    # driver threads so the second job back-fills the first one's
    # task tail instead of queuing behind it (§2.6).  At this SF the
    # query is job-count-bound (r11 scaling: 6.42 s at 32 cores vs
    # 6.49 s at 8), so serial-job removal IS the optimization.
    with ThreadPoolExecutor(max_workers=2) as pool:
        f_owned = pool.submit(persist_reused, owned_frame)
        f_nb = pool.submit(_neighbors, spark, sf_dir)
        owned = f_owned.result()
        nb = f_nb.result()
    # One exchange for aggregate + novelty filter + ranking: evidence
    # aggregation groups by (custkey, item), the anti join keys on
    # (custkey, item), and the final window partitions by custkey —
    # clustering by "o_custkey" alone satisfies all three, so an
    # explicit hash repartition on it lets the whole tail share ONE
    # exchange (the former plan exchanged by (custkey, neighbor) for
    # the aggregate and again by custkey for the window).
    cand = (
        owned.join(nb, nb["anchor"] == owned["item"])
        .repartition("o_custkey")
        .groupBy("o_custkey", F.col("neighbor").alias("cand_item"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_evidence"),
            F.sum("n_ab").cast("bigint").alias("evidence_weight"),
        )
        .withColumnRenamed("cand_item", "item")
    )
    new_items = cand.join(
        owned,
        ["o_custkey", "item"],
        "left_anti",
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("n_evidence").desc(),
        F.col("evidence_weight").desc(),
        "item",
    )
    return (
        new_items.withColumn(
            "rnk", F.row_number().over(w).cast("bigint")
        )
        .where(F.col("rnk") <= 3)
        .select("o_custkey", "item", "n_evidence", "evidence_weight", "rnk")
    )


@register(
    "rec_coverage_popularity_bias",
    f"""
    WITH supp AS ({_SQL_SUPP}),
    nb AS ({_SQL_NEIGHBORS}),
    deciles AS (
      SELECT item, n_item,
             NTILE(10) OVER (ORDER BY n_item, item) AS pop_decile
      FROM supp
    ),
    slots AS (
      SELECT n.neighbor AS item FROM nb n
    )
    SELECT CAST(d.pop_decile AS BIGINT) AS pop_decile,
      CAST(COUNT(DISTINCT d.item) AS BIGINT) AS n_catalog_items,
      CAST(COUNT(DISTINCT s.item) AS BIGINT) AS n_recommended_items,
      CAST(COUNT(s.item) AS BIGINT) AS n_slots,
      CAST(COUNT(DISTINCT s.item) AS DOUBLE)
        / CAST(COUNT(DISTINCT d.item) AS DOUBLE) AS coverage
    FROM deciles d LEFT JOIN slots s ON s.item = d.item
    GROUP BY 1
    """,
    doc="Recommendation audit: catalog coverage and popularity bias "
    "of the top-3 neighbor lists, per popularity decile (NTILE over "
    "item support, tie on key).  n_slots counts how many list slots "
    "each decile's items occupy; coverage is the share of the "
    "decile's catalog that appears in ANY list — the "
    "long-tail-starvation check run before shipping a recommender.  "
    "Counts are exact integers off the already-bounded neighbor "
    "table; coverage is ONE IEEE division.  The decile rank runs on "
    "the O(catalog) support frame, never the purchase log.",
)
def rec_coverage_popularity_bias(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    b = _baskets(spark, sf_dir)
    supp = _supp(b)
    wd = Window.orderBy("n_item", "item")
    deciles = supp.select(
        "item", "n_item", F.ntile(10).over(wd).alias("pop_decile")
    )
    slots = _neighbors(spark, sf_dir).select(
        F.col("neighbor").alias("slot_item")
    )
    j = deciles.join(
        slots, F.col("slot_item") == F.col("item"), "left"
    )
    return j.groupBy(
        F.col("pop_decile").cast("bigint").alias("pop_decile")
    ).agg(
        F.countDistinct("item").cast("bigint").alias("n_catalog_items"),
        F.countDistinct("slot_item")
        .cast("bigint")
        .alias("n_recommended_items"),
        F.count("slot_item").cast("bigint").alias("n_slots"),
        (
            F.countDistinct("slot_item").cast("double")
            / F.countDistinct("item").cast("double")
        ).alias("coverage"),
    )
