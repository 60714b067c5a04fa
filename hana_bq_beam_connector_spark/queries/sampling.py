"""Deterministic sampling & dataset splits (LLM-data surface).

Training-data pipelines need *reproducible* sampling: the same
document must land in the same split on every run, on any cluster
layout, at any parallelism.  Engine RNG sampling (``df.sample``,
``TABLESAMPLE``) is partitioning-dependent, so these operators derive
the assignment from a content-stable key instead — the shared
cross-engine polynomial hash of the document id (functions/
hashing.py) taken modulo the split space.  That makes the sample a
pure projection: no shuffle, no state, embarrassingly parallel at
100 TB, and bit-replayable by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hana_bq_beam_connector_spark.functions.hashing import (
    duck_polyhash,
    spark_polyhash,
)
from hana_bq_beam_connector_spark.queries import register
from hana_bq_beam_connector_spark.sources.files import load_table

_SPARK_BUCKET = (
    f"pmod({spark_polyhash('cast(doc_id as string)')}, 100)"
)
_DUCK_BUCKET = (
    f"(({duck_polyhash('CAST(doc_id AS VARCHAR)')}) % 100 + 100) % 100"
)


@register(
    "sample_hash_stratified",
    f"""
    SELECT lang, COUNT(*) AS n_sampled,
      CAST(SUM(CAST(length(text) AS BIGINT)) AS BIGINT) AS total_chars
    FROM documents
    WHERE {_DUCK_BUCKET} < 30
    GROUP BY lang
    """,
    doc="Deterministic 30% sample, stratified accounting by lang: "
    "membership = polyhash(doc_id) mod 100 < 30, so the sample is "
    "stable across runs/cluster layouts and composable (a 10% sample "
    "is a subset of the 30%).  Pure filter — no shuffle, no RNG "
    "state; the oracle replays the identical integer hash.",
)
def sample_hash_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.where(F.expr(_SPARK_BUCKET) < 30)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(F.length("text").cast("long")).alias("total_chars"),
        )
    )


@register(
    "split_train_val_test",
    f"""
    SELECT lang,
      CASE WHEN {_DUCK_BUCKET} < 80 THEN 'train'
           WHEN {_DUCK_BUCKET} < 90 THEN 'val'
           ELSE 'test' END AS split,
      COUNT(*) AS n_docs,
      MIN(doc_id) AS first_doc
    FROM documents
    GROUP BY 1, 2
    """,
    doc="80/10/10 train/val/test split by hashed doc id: every engine "
    "and every run assigns each document to the same split — the "
    "reproducibility contract dataset cards assume.  Assignment is a "
    "projection; only the audit count aggregates.",
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bucket = F.expr(_SPARK_BUCKET)
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.withColumn("split", split)
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
    )


@register(
    "pack_sequences_by_budget",
    """
    WITH t AS (
      SELECT doc_id, lang,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, lang, n_tokens,
        SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM t
    )
    SELECT doc_id, lang, n_tokens,
      CAST((cum_tokens - n_tokens) // 1024 AS BIGINT) AS pack_id,
      CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM c
    """,
    doc="Sequence packing for training (fixed 1024-token budget): "
    "contiguous greedy packing by running token count within each "
    "lang shard — fully deterministic (doc_id order), so every "
    "run/world-size produces identical packs.  The running sum comes "
    "from two_phase_scan (range-partition the per-lang doc_id order, "
    "slice-local prefix sums, tiny offset frame) because lang is "
    "constant-cardinality: a plain per-lang window would scan n/5 "
    "rows in one task at any scale.  The assignment is what a "
    "dataloader shards on.",
)
def pack_sequences_by_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hana_bq_beam_connector_spark.operators.relational import (
        two_phase_scan,
    )

    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "lang",
        F.size(F.split("text", r"\s+")).cast("long").alias("n_tokens"),
    )
    c = two_phase_scan(
        t, ["lang"], [F.col("doc_id")], {"cum_tokens": F.col("n_tokens")}
    )
    return c.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.expr("(cum_tokens - n_tokens) div 1024").alias("pack_id"),
        "cum_tokens",
    )


# Affine id hash for priority sampling: a, b from the shared MinHash
# constant pool; (doc_id % PRIME) first so a*x stays well inside
# BIGINT in both engines (Spark would wrap silently, DuckDB would
# raise — neither is allowed to happen).
_PRI_A, _PRI_B = 472882049, 126292772
_PRI_P = 1_000_000_007
_PRI_HASH = f"(({_PRI_A} * (doc_id % {_PRI_P}) + {_PRI_B}) % {_PRI_P})"


@register(
    "sample_weighted_priority",
    f"""
    SELECT doc_id, n_chars,
           CAST({_PRI_HASH} AS DOUBLE) / n_chars AS priority
    FROM documents
    WHERE n_chars > 0
    ORDER BY priority, doc_id
    LIMIT 200
    """,
    doc="Deterministic weighted sampling (Efraimidis–Spirakis shape): "
    "priority = hash(id)/weight, keep the k smallest — longer "
    "documents get proportionally smaller priorities, so inclusion "
    "odds grow with weight, yet the sample is a pure function of ids "
    "(reproducible across runs, layouts, cluster sizes; union-able "
    "across increments by re-ranking).  The exact E-S exponential "
    "race needs ln(u) — skipped deliberately: libm vs JVM log differ "
    "in the last ulp, which would break cross-engine bit equality.  "
    "Distributed as TakeOrdered (per-partition top-k then merge k·p "
    "rows) — no global sort.",
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    return (
        d.select(
            "doc_id",
            "n_chars",
            (F.expr(_PRI_HASH).cast("double") / F.col("n_chars")).alias(
                "priority"
            ),
        )
        .orderBy("priority", "doc_id")
        .limit(200)
    )


@register(
    "sample_class_balanced",
    f"""
    WITH ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY {duck_polyhash('CAST(doc_id AS VARCHAR)')}, doc_id
             ) AS rk
      FROM documents
    ),
    counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    m AS (SELECT lang, MIN(n) OVER () AS mn FROM counts)
    SELECT r.lang, COUNT(*) AS n_sampled,
           CAST(SUM(r.doc_id) AS BIGINT) AS id_checksum
    FROM ranked r JOIN m ON r.lang = m.lang
    WHERE r.rk <= m.mn
    GROUP BY r.lang
    """,
    doc="Class-balanced downsampling: every language keeps exactly "
    "min-class-count documents, chosen by hash-priority rank "
    "(polyhash(doc_id) order, ties by doc_id) — deterministic across "
    "runs and layouts, no RNG.  The per-lang rank comes from "
    "two_phase_rank (lang is constant-cardinality — a plain window "
    "would sort n/5 rows in one task); the minority count attaches "
    "to the tiny per-lang counts frame via an unpartitioned window "
    "(rows = #languages, by construction small) and broadcast-equi-"
    "joins back onto the ranked documents — no nested-loop scalar "
    "cross.  id_checksum pins the exact selected set, not just its "
    "size.",
)
def sample_class_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from hana_bq_beam_connector_spark.operators.relational import (
        two_phase_rank,
    )

    d = load_table(spark, sf_dir, "documents")
    pri = d.select(
        "doc_id",
        "lang",
        F.expr(spark_polyhash("cast(doc_id as string)")).alias("__pri"),
    )
    ranked = two_phase_rank(
        pri, ["lang"], [F.col("__pri"), F.col("doc_id")], out="rk"
    ).select("doc_id", "lang", "rk")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    mn = F.min("n").over(
        Window.orderBy(F.lit(1)).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    quota = counts.select("lang", mn.alias("mn"))
    return (
        ranked.join(F.broadcast(quota), "lang")
        .where(F.col("rk") <= F.col("mn"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("doc_id").alias("id_checksum"),
        )
    )
