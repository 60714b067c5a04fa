"""End-to-end training-data curation pipeline (LLM-data surface).

The composed shape every corpus build runs: quality-score → filter →
exact near-dup removal (normalized-text fingerprint, deterministic
survivor) → reproducible train/val/test assignment.  Each stage is an
existing operator (operators/text.py, operators/dedup.py,
queries/sampling.py's hash bucket); this query wires them into one
lazy plan so Catalyst fuses the scans: quality features and the
fingerprint hash compute in the SAME scan stage, the only shuffle is
the survivor window on the fingerprint, and the split assignment is a
shuffle-free projection on the survivors.  At 100 TB that is one pass
over the corpus plus one fingerprint-keyed exchange — the minimal
shuffle bill for dedup-with-survivor semantics.

The reference has no analog (SURVEY §2b — it copies one table); this
is the north-star extension surface (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hana_bq_beam_connector_spark.functions.hashing import (
    duck_polyhash,
    duck_shingle_hash_chain,
    spark_polyhash,
)
from hana_bq_beam_connector_spark.operators._common import explode_nonempty
from hana_bq_beam_connector_spark.operators.dedup import keep_first_by_key
from hana_bq_beam_connector_spark.operators.text import quality_features
from hana_bq_beam_connector_spark.queries import register
from hana_bq_beam_connector_spark.sources.files import load_table

_SPARK_BUCKET = f"pmod({spark_polyhash('cast(doc_id as string)')}, 100)"
_DUCK_BUCKET = (
    f"(({duck_polyhash('CAST(doc_id AS VARCHAR)')}) % 100 + 100) % 100"
)
_SPARK_NORM = "regexp_replace(lower(text), '\\\\s+', ' ')"
_DUCK_NORM = "regexp_replace(lower(text), '\\s+', ' ', 'g')"


@register(
    "curation_pipeline",
    f"""
    WITH scored AS (
      SELECT doc_id, lang,
        CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT)
          AS n_tokens,
        CAST(len(list_distinct(string_split_regex(lower(text), '\\s+')))
          AS DOUBLE)
          / CAST(len(string_split_regex(lower(text), '\\s+')) AS DOUBLE)
          * 0.5
          + LEAST(CAST(len(string_split_regex(lower(text), '\\s+'))
                       AS DOUBLE) / 100.0, 1.0) * 0.5 AS quality_score,
        {duck_polyhash(_DUCK_NORM)} AS fp,
        {_DUCK_BUCKET} AS bucket
      FROM documents
    ),
    kept AS (
      SELECT * FROM scored
      WHERE quality_score >= 0.5 AND n_tokens >= 10
    ),
    survivors AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY fp ORDER BY doc_id
        ) AS rn FROM kept
      ) WHERE rn = 1
    )
    SELECT doc_id, lang, n_tokens, quality_score,
      CASE WHEN bucket < 80 THEN 'train'
           WHEN bucket < 90 THEN 'val'
           ELSE 'test' END AS split
    FROM survivors
    """,
    doc="Full curation pipeline: quality filter (score >= 0.5, >= 10 "
    "tokens) → exact near-dup removal on the normalized-text "
    "fingerprint (min-doc_id survivor) → deterministic 80/10/10 "
    "split.  One corpus scan + one fingerprint shuffle; split "
    "assignment is a pure projection.",
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    scored = (
        quality_features(d, "text")
        .withColumn("fp", F.expr(spark_polyhash(_SPARK_NORM)))
        .withColumn("bucket", F.expr(_SPARK_BUCKET))
    )
    kept = scored.where(
        (F.col("quality_score") >= 0.5) & (F.col("n_tokens") >= 10)
    )
    survivors = keep_first_by_key(
        kept, key=["fp"], order=[F.col("doc_id")]
    )
    split = (
        F.when(F.col("bucket") < 80, "train")
        .when(F.col("bucket") < 90, "val")
        .otherwise("test")
    )
    return survivors.select(
        "doc_id", "lang", "n_tokens", "quality_score", split.alias("split")
    )


def _duck_5gram_hashes(src: str) -> str:
    """CTE body: (doc_id, gh) — distinct composed 5-gram hashes per
    doc, mirroring operators/dedup.shingle_hashes(k=5) exactly."""
    return f"""
      SELECT doc_id, unnest(g5) AS gh FROM (
        SELECT doc_id,
          list_distinct(list_transform(range(1, len(wh) - 3),
            i -> {duck_shingle_hash_chain("wh", "i", 5)})) AS g5
        FROM (
          SELECT doc_id,
            list_transform(string_split(text, ' '),
                           x -> {duck_polyhash("x")}) AS wh
          FROM documents
          WHERE len(string_split(text, ' ')) >= 5 AND ({src})
        )
      )"""


@register(
    "decontam_ngram_overlap",
    f"""
    WITH eval_grams AS (
      SELECT DISTINCT gh FROM ({_duck_5gram_hashes("doc_id % 50 = 0")})
    ),
    train AS ({_duck_5gram_hashes("doc_id % 50 <> 0")})
    SELECT train.doc_id, COUNT(*) AS n_shared_ngrams
    FROM train JOIN eval_grams USING (gh)
    GROUP BY train.doc_id
    """,
    doc="Benchmark decontamination: flag training documents sharing "
    "any word 5-gram with the held-out eval slice (doc_id % 50 = 0 "
    "stands in for the benchmark set).  No n-gram STRING ever "
    "exists: each word is character-hashed once and 5-gram hashes "
    "compose word hashes (same chain as MinHash shingling — O(chars "
    "+ words*5) integer ops).  Eval hashes BROADCAST (eval sets are "
    "MBs even when the corpus is 100 TB); per-doc hashes are "
    "pre-distinct arrays, so the post-join agg is a plain COUNT.  "
    "The only exchange is that count's 16-byte partials.",
)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hana_bq_beam_connector_spark.operators.dedup import shingle_hashes

    d = load_table(spark, sf_dir, "documents")

    def grams(pred):
        side = d.where(pred).select("doc_id", "text")
        # shingle_hashes guarantees >= 1 shingle per surviving row.
        return shingle_hashes(side, "text", k=5, out="g5").select(
            "doc_id", explode_nonempty("g5").alias("gh")
        )

    eval_grams = grams(F.col("doc_id") % 50 == 0).select("gh").distinct()
    train = grams(F.col("doc_id") % 50 != 0)
    return (
        train.join(F.broadcast(eval_grams), "gh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )


@register(
    "corpus_global_shuffle",
    f"""
    WITH keyed AS (
      SELECT doc_id,
        {duck_polyhash("CAST(doc_id AS VARCHAR)")} AS k
      FROM documents
    )
    SELECT doc_id,
      CAST((k % 64 + 64) % 64 AS BIGINT) AS shuffle_bucket,
      CAST(ROW_NUMBER() OVER (
        PARTITION BY (k % 64 + 64) % 64 ORDER BY k, doc_id
      ) AS BIGINT) AS pos_in_bucket
    FROM keyed
    """,
    doc="Deterministic global training shuffle: content-hash key -> "
    "64 shuffle buckets -> in-bucket rank.  Reproducible on any "
    "input layout (pure function of doc_id, no RNG).  The bucket "
    "count is CONSTANT, so the in-bucket rank comes from "
    "two_phase_rank — 64 window partitions still means n/64 rows "
    "per task at 10^9 rows; the two-phase rank's per-task input is "
    "bounded by the range-slice size instead.  Readers consume "
    "buckets in order for a full epoch permutation.",
)
def corpus_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hana_bq_beam_connector_spark.operators.relational import (
        two_phase_rank,
    )

    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        F.expr(spark_polyhash("cast(doc_id as string)")).alias("k"),
        F.pmod(
            F.expr(spark_polyhash("cast(doc_id as string)")), F.lit(64)
        ).cast("long").alias("shuffle_bucket"),
    )
    ranked = two_phase_rank(
        keyed,
        ["shuffle_bucket"],
        [F.col("k"), F.col("doc_id")],
        out="pos_in_bucket",
    )
    return ranked.select(
        "doc_id",
        "shuffle_bucket",
        F.col("pos_in_bucket").cast("long").alias("pos_in_bucket"),
    )


_DUCK_QSCORE = (
    "CAST(len(list_distinct(string_split_regex(lower(text), '\\s+')))"
    " AS DOUBLE)"
    " / CAST(len(string_split_regex(lower(text), '\\s+')) AS DOUBLE)"
    " * 0.5"
    " + LEAST(CAST(len(string_split_regex(lower(text), '\\s+'))"
    " AS DOUBLE) / 100.0, 1.0) * 0.5"
)


@register(
    "curation_quality_quantile_filter",
    f"""
    SELECT doc_id, lang, quality_score, pr FROM (
      SELECT doc_id, lang, quality_score,
        PERCENT_RANK() OVER (
          PARTITION BY lang ORDER BY quality_score
        ) AS pr
      FROM (
        SELECT doc_id, lang, {_DUCK_QSCORE} AS quality_score
        FROM documents
      )
    ) WHERE pr >= 0.25
    """,
    doc="Corpus-RELATIVE quality cutoff: drop the bottom quartile per "
    "language by percent_rank instead of a fixed threshold — the "
    "curation policy that survives distribution drift (a fixed 0.75 "
    "bar deletes whole low-resource languages; a quantile bar keeps "
    "every language's best 75%).  percent_rank = (rank-1)/(n-1) is "
    "the same IEEE division both engines — but lang is constant-"
    "cardinality, so the rank is NOT a per-lang window sort (n/5 "
    "rows in one task at any scale): ties share a rank, so rank() "
    "factors through the per-(lang, score) group — aggregate counts "
    "per distinct score, two_phase_scan the tiny ordered score frame "
    "for cumulative counts (rank = cum - cnt + 1), and equi-join the "
    "qualifying scores back.  Same rows, same doubles.",
)
def curation_quality_quantile_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from hana_bq_beam_connector_spark.operators.relational import (
        two_phase_scan,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    scored = quality_features(d, "text").select(
        "doc_id", "lang", "quality_score"
    )
    per_score = scored.groupBy("lang", "quality_score").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    cum = two_phase_scan(
        per_score,
        ["lang"],
        [F.col("quality_score")],
        {"cum_cnt": F.col("cnt")},
    )
    n_by = per_score.groupBy("lang").agg(F.sum("cnt").alias("n"))
    ranked = cum.join(F.broadcast(n_by), "lang").select(
        "lang",
        "quality_score",
        F.when(F.col("n") == 1, F.lit(0.0))
        .otherwise(
            (F.col("cum_cnt") - F.col("cnt")).cast("double")
            / (F.col("n") - 1).cast("double")
        )
        .alias("pr"),
    )
    qualifying = ranked.where(F.col("pr") >= 0.25)
    return scored.join(
        qualifying, ["lang", "quality_score"]
    ).select("doc_id", "lang", "quality_score", "pr")


@register(
    "curation_budget_mixture",
    f"""
    WITH pri AS (
      SELECT doc_id, lang, n_chars,
        {duck_polyhash("CAST(doc_id AS VARCHAR)")} AS pri
      FROM documents
    ),
    acc AS (
      SELECT doc_id, lang, n_chars,
        COALESCE(SUM(n_chars) OVER (
          PARTITION BY lang ORDER BY pri, doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
        ), 0) AS chars_before
      FROM pri
    )
    SELECT doc_id, lang, n_chars, CAST(chars_before AS BIGINT) AS chars_before
    FROM acc WHERE chars_before < 20000
    """,
    doc="Training-mixture budget sampler: every LLM corpus build ends "
    "with 'take N tokens per language/domain in a reproducible way'. "
    "Docs are ordered by deterministic hash priority (an unbiased "
    "fixed sample, not arrival order) and greedily taken while the "
    "EXCLUSIVE running size is under the per-lang budget — so the "
    "budget is always met or minimally overshot by one doc, and the "
    "selection is identical on any run/layout.  lang is constant-"
    "cardinality, so the exclusive prefix sum comes from "
    "two_phase_scan (range-partitioned slice-local running sums + "
    "offsets; chars_before = inclusive cum - own size) — never a "
    "per-lang window over n/5 rows in one task.",
)
def curation_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hana_bq_beam_connector_spark.operators.relational import (
        two_phase_scan,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    pri = F.expr(spark_polyhash("cast(doc_id as string)"))
    cum = two_phase_scan(
        d.withColumn("__pri", pri),
        ["lang"],
        [F.col("__pri"), F.col("doc_id")],
        {"cum_chars": F.col("n_chars")},
    )
    return (
        cum.withColumn(
            "chars_before",
            (F.col("cum_chars") - F.col("n_chars")).cast("long"),
        )
        .where(F.col("chars_before") < 20000)
        .select("doc_id", "lang", "n_chars", "chars_before")
    )


@register(
    "curation_quality_quantile_sketch",
    f"""
    WITH scored AS (
      SELECT doc_id, lang, {_DUCK_QSCORE} AS quality_score
      FROM documents
    ),
    th AS (
      SELECT lang, quantile_disc(quality_score, 0.25) AS q25
      FROM scored GROUP BY lang
    )
    SELECT s.doc_id, s.lang, s.quality_score, th.q25
    FROM scored s JOIN th USING (lang)
    WHERE s.quality_score >= th.q25
    """,
    doc="The SCALE path for the corpus-relative quality cutoff: "
    "per-lang thresholds from ONE percentile-sketch aggregation pass, "
    "broadcast back as a plain filter — replaces "
    "curation_quality_quantile_filter's full per-lang window sort "
    "(same policy, no sort of the corpus; at 100 TB the sort is the "
    "bill).  Cutoff is >= the discrete 25th-percentile score, so the "
    "kept set differs from percent_rank's strict-quartile drop only "
    "at tie boundaries — both are deterministic.  The sketch runs in "
    "its exact regime (accuracy 1e8, eps*n < 1 per lang) so the "
    "oracle is plain quantile_disc; production dials accuracy down "
    "and the answer degrades gracefully (rank error <= eps*n).",
)
def curation_quality_quantile_sketch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    scored = quality_features(d, "text").select(
        "doc_id", "lang", "quality_score"
    )
    thresholds = scored.groupBy("lang").agg(
        F.percentile_approx(
            "quality_score", F.lit(0.25), F.lit(100_000_000)
        ).alias("q25")
    )
    return (
        scored.join(F.broadcast(thresholds), "lang")
        .where(F.col("quality_score") >= F.col("q25"))
        .select("doc_id", "lang", "quality_score", "q25")
    )


@register(
    "curation_source_cap",
    f"""
    WITH ranked AS (
      SELECT doc_id, source, n_chars,
        ROW_NUMBER() OVER (
          PARTITION BY source
          ORDER BY {duck_polyhash("CAST(doc_id AS VARCHAR)")}, doc_id
        ) AS rk
      FROM documents
    )
    SELECT source,
      COUNT(*) AS n_kept,
      CAST(SUM(n_chars) AS BIGINT) AS kept_chars,
      MIN(doc_id) AS first_doc
    FROM ranked
    WHERE rk <= 40
    GROUP BY source
    """,
    doc="Per-source (domain) document cap — the over-represented-"
    "domain guard every web-corpus build applies (cap each domain at "
    "N docs so no single crawl host dominates training).  Survivor "
    "choice is a deterministic hash-priority rank, not arrival order, "
    "so the kept set is an unbiased fixed-size sample per source and "
    "identical on every run/layout.  Runs the two-phase skew-safe cap "
    "(operators/relational.topk_per_group_skewed): phase 1 truncates "
    "each (source, salt) subgroup to N on 64-way salted tasks, phase "
    "2 re-ranks the <= N*64 survivors per source — a hot domain costs "
    "O(domain/64) per task instead of one task sorting the whole "
    "domain.  Exact, not approximate: the selection identity (top-N "
    "of a group == top-N of its subgroups' top-Ns) is property-tested "
    "against the single-window rank in tests/test_properties.py, and "
    "the oracle is the plain one-window SQL.",
)
def curation_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hana_bq_beam_connector_spark.operators.relational import (
        topk_per_group_skewed,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    pri = F.expr(spark_polyhash("cast(doc_id as string)"))
    capped = topk_per_group_skewed(
        d,
        partition_by=["source"],
        order=[pri.asc(), F.col("doc_id").asc()],
        k=40,
        rank_col="rk",
    )
    return capped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").cast("long").alias("kept_chars"),
        F.min("doc_id").alias("first_doc"),
    )


@register(
    "curation_corpus_composition",
    """
    WITH g AS (
      SELECT source, lang,
             COUNT(*) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM documents GROUP BY source, lang
    )
    SELECT source, lang, n_docs, n_tokens, sum_chars,
           CAST(n_tokens AS DOUBLE)
             / CAST(SUM(n_tokens) OVER () AS DOUBLE) AS token_share
    FROM g
    """,
    doc="Corpus-composition (data-mixing) report: per (source, lang) "
    "doc/token/char totals and each cell's token share of the whole "
    "corpus — the table every mixture-weight decision starts from.  "
    "One partial-agg'd groupBy; the global total is a second agg "
    "over the tiny grouped frame (crossed via an unpartitioned "
    "window), never a rescan.  Shares divide exact integer totals — "
    "one IEEE division, identical in both engines.",
)
def curation_corpus_composition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    g = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )
    total = F.sum("n_tokens").over(Window.partitionBy())
    return g.withColumn(
        "token_share",
        F.col("n_tokens").cast("double") / total.cast("double"),
    )


@register(
    "curation_blocklist_filter",
    """
    WITH tot AS (
      SELECT source, CAST(SUM(n_chars) AS BIGINT) AS chars
      FROM documents GROUP BY source
    ),
    blocked AS (
      SELECT source FROM (
        SELECT source, ROW_NUMBER() OVER (ORDER BY chars DESC, source) AS rk
        FROM tot
      ) WHERE rk <= 5
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents WHERE source NOT IN (SELECT source FROM blocked)
    GROUP BY lang
    """,
    doc="Source/domain blocklist filtering (the robots/spam-domain "
    "step of web-corpus curation): derive the blocklist — here the 5 "
    "heaviest sources by total chars, i.e. a data-driven 'spammy "
    "domain' rule — then anti-join the corpus against it.  The "
    "blocklist derivation aggregates to O(#sources) rows (one "
    "partial-agg shuffle), the blocklist itself is tiny and "
    "BROADCASTS, so the corpus-side filter is a scan-local hash "
    "probe — the 100 TB side never shuffles.",
)
def curation_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    tot = d.groupBy("source").agg(F.sum("n_chars").cast("long").alias("chars"))
    rk = F.row_number().over(Window.orderBy(F.col("chars").desc(), "source"))
    blocked = tot.select("source", rk.alias("rk")).where(F.col("rk") <= 5)
    kept = d.join(F.broadcast(blocked.select("source")), "source", "left_anti")
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


_QUALITY_RULES = [
    ("quantity_range", "l_quantity >= 1 AND l_quantity <= 50"),
    ("discount_range", "l_discount >= 0 AND l_discount <= 0.08"),
    ("tax_range", "l_tax >= 0 AND l_tax <= 0.06"),
    ("price_positive", "l_extendedprice > 0"),
    ("returnflag_valid", "l_returnflag IN ('A', 'N', 'R')"),
]


@register(
    "curation_rule_report",
    "\nUNION ALL\n".join(
        f"""
    SELECT '{name}' AS rule, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN NOT ({cond}) THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations
    FROM lineitem"""
        for name, cond in _QUALITY_RULES
    ),
    doc="Data-quality rules engine: evaluate a named rule set over "
    "the fact table and report violations per rule — the publish "
    "gate of an ingest pipeline.  The Spark plan evaluates ALL "
    "rules in ONE scan (one agg row of per-rule violation counts, "
    "then a stack() unpivot of that single row); the oracle's "
    "UNION ALL spelling is the semantic definition, not the plan.  "
    "Per-rule counts partial-aggregate map-side, so the exchange "
    "carries one row per partition regardless of table size.",
)
def curation_rule_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.when(~F.expr(cond), 1).otherwise(0))
        .cast("long")
        .alias(f"v_{i}")
        for i, (_, cond) in enumerate(_QUALITY_RULES)
    ]
    one = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', v_{i}" for i, (name, _) in enumerate(_QUALITY_RULES)
    )
    return one.select(
        F.expr(
            f"stack({len(_QUALITY_RULES)}, {stack_args}) AS (rule, n_violations)"
        ),
        "n_rows",
    ).select("rule", "n_rows", "n_violations")


@register(
    "curation_quarantine_rows",
    f"""
    SELECT l_orderkey, l_linenumber,
      concat_ws(',',
        {", ".join(f"CASE WHEN NOT ({cond}) THEN '{name}' END" for name, cond in _QUALITY_RULES)}
      ) AS violated_rules
    FROM lineitem
    WHERE NOT ({" AND ".join(f"({cond})" for _, cond in _QUALITY_RULES)})
    """,
    doc="Row-level quality routing (the quarantine half of the rules "
    "engine): rows violating any named rule are emitted with the "
    "comma-joined list of violated rules (fixed rule order, so the "
    "label string is deterministic); clean rows continue to the "
    "sink.  One scan, zero shuffles — both the route predicate and "
    "the label are codegen'd projections, so quarantining 100 TB "
    "costs the scan you were already paying.  Pairs with "
    "curation_rule_report (the aggregate view of the same rule "
    "set).",
)
def curation_quarantine_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    labels = [
        F.when(~F.expr(cond), F.lit(name)) for name, cond in _QUALITY_RULES
    ]
    any_violation = None
    for _, cond in _QUALITY_RULES:
        v = ~F.expr(cond)
        any_violation = v if any_violation is None else (any_violation | v)
    return li.where(any_violation).select(
        "l_orderkey",
        "l_linenumber",
        F.concat_ws(",", *labels).alias("violated_rules"),
    )


# Deterministic stand-in for a learned quality classifier: an integer
# linear model over exact lexical features (no floats, no exp — the
# raw logit score is the output, so both engines agree bit-for-bit).
# The Spark-side shape IS the model-inference-at-scale shape: a
# codegen'd projection over one scan; swapping in a real model means
# swapping the projection for an Arrow-batched pandas UDF, nothing
# else moves.
_W_UNIQ, _W_REP, _W_STOP, _SCORE_CUT = 100, 150, 500, 0

_DUCK_MODEL_CTE = f"""f AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) AS n_words,
             len(list_distinct(string_split(text, ' '))) AS n_uniq,
             len(list_filter(string_split(text, ' '),
                             x -> x = 'the' OR x = 'a')) AS n_stop
      FROM documents
    ),
    scored AS (
      SELECT doc_id, source,
             {_W_UNIQ} * n_uniq - {_W_REP} * (n_words - n_uniq)
               + {_W_STOP} * n_stop AS score
      FROM f
    )"""


def _model_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words).cast("bigint")
    n_uniq = F.size(F.array_distinct(words)).cast("bigint")
    n_stop = F.size(
        F.filter(words, lambda x: (x == "the") | (x == "a"))
    ).cast("bigint")
    score = (
        F.lit(_W_UNIQ) * n_uniq
        - F.lit(_W_REP) * (n_words - n_uniq)
        + F.lit(_W_STOP) * n_stop
    )
    return d.select("doc_id", "source", score.alias("score"))


@register(
    "curation_model_score",
    f"""
    WITH {_DUCK_MODEL_CTE}
    SELECT doc_id, score, score >= {_SCORE_CUT} AS accept
    FROM scored
    """,
    doc="Per-document classifier scoring: an integer linear model over "
    "exact lexical features (distinct tokens reward, repetition "
    "penalty, stopword evidence) emits a logit-like score and an "
    "accept decision.  The deterministic stand-in for running a "
    "learned quality classifier over the corpus — same one-scan "
    "codegen'd-projection plan; a real model would swap the "
    "projection for an Arrow-batched pandas UDF stage.",
)
def curation_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _model_scored(spark, sf_dir)
    return scored.select(
        "doc_id",
        "score",
        (F.col("score") >= _SCORE_CUT).alias("accept"),
    )


@register(
    "curation_model_score_by_source",
    f"""
    WITH {_DUCK_MODEL_CTE}
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN score >= {_SCORE_CUT} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_accept,
           CAST(CAST(SUM(CASE WHEN score >= {_SCORE_CUT} THEN 1 ELSE 0 END)
                     AS BIGINT) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS accept_share,
           MIN(score) AS min_score,
           MAX(score) AS max_score
    FROM scored GROUP BY source
    """,
    doc="Classifier-score calibration report per source: document "
    "counts, accept counts/share (one IEEE division of exact "
    "integers), and the score envelope — the dashboard that catches "
    "a source whose distribution drifted.  Same single scan as the "
    "per-doc query, reduced map-side to one row per source.",
)
def curation_model_score_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    scored = _model_scored(spark, sf_dir)
    accept1 = F.when(F.col("score") >= _SCORE_CUT, 1).otherwise(0)
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(accept1).alias("n_accept"),
        (F.sum(accept1).cast("double") / F.count(F.lit(1)).cast("double")
         ).alias("accept_share"),
        F.min("score").alias("min_score"),
        F.max("score").alias("max_score"),
    )


# Epoch/repetition planner knobs: train on half the corpus-equivalent
# character budget, split equally across sources, repeating any
# undersized source at most _MAX_EPOCHS times (data-constrained
# regime: repetition beyond a few epochs stops buying quality).
_MAX_EPOCHS = 4


@register(
    "curation_epoch_plan",
    f"""
    WITH per_src AS (
      SELECT source, CAST(SUM(n_chars) AS BIGINT) AS src_chars
      FROM documents GROUP BY source
    ),
    totals AS (
      SELECT CAST(SUM(n_chars) AS BIGINT) AS total_chars,
             COUNT(DISTINCT source) AS n_sources
      FROM documents
    )
    SELECT p.source, p.src_chars,
           (t.total_chars // 2) // t.n_sources AS share_chars,
           LEAST((((t.total_chars // 2) // t.n_sources)
                  + p.src_chars - 1) // p.src_chars,
                 {_MAX_EPOCHS}) AS epochs,
           LEAST((t.total_chars // 2) // t.n_sources,
                 p.src_chars * LEAST((((t.total_chars // 2)
                                       // t.n_sources)
                                      + p.src_chars - 1) // p.src_chars,
                                     {_MAX_EPOCHS})) AS planned_chars,
           ((t.total_chars // 2) // t.n_sources)
             - LEAST((t.total_chars // 2) // t.n_sources,
                     p.src_chars * LEAST((((t.total_chars // 2)
                                           // t.n_sources)
                                          + p.src_chars - 1)
                                         // p.src_chars,
                                         {_MAX_EPOCHS})) AS deficit_chars
    FROM per_src p CROSS JOIN totals t
    """,
    doc="Epoch/repetition plan for a data-constrained training run: "
    "each source gets an equal share of the half-corpus character "
    "budget; undersized sources repeat (ceil of share/size, integer "
    "arithmetic) capped at 4 epochs, and the unfillable remainder "
    "surfaces as an explicit deficit instead of silent "
    "under-delivery.  One aggregate per source + a 1-row totals "
    "broadcast — the planning table is source-cardinality-sized at "
    "any corpus scale.",
)
def curation_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.sum("n_chars").cast("bigint").alias("src_chars")
    )
    totals = d.agg(
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.countDistinct("source").alias("n_sources"),
    )
    j = per_src.crossJoin(F.broadcast(totals))
    share = F.expr("(total_chars div 2) div n_sources")
    epochs = F.least(
        F.expr(
            "(((total_chars div 2) div n_sources) + src_chars - 1) "
            "div src_chars"
        ),
        F.lit(_MAX_EPOCHS).cast("bigint"),
    )
    planned = F.least(share, F.col("src_chars") * epochs)
    return j.select(
        "source",
        "src_chars",
        share.alias("share_chars"),
        epochs.alias("epochs"),
        planned.alias("planned_chars"),
        (share - planned).alias("deficit_chars"),
    )


@register(
    "curation_bigram_lm_score",
    f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ),
    wh AS (
      SELECT doc_id,
             list_transform(ws, w -> {duck_polyhash('w')}) AS hs
      FROM t
    ),
    bg AS (
      SELECT doc_id,
        unnest(list_transform(range(1, len(hs)),
          i -> struct_pack(pos := i, h1 := hs[i], h2 := hs[i + 1])))
          AS b
      FROM wh
    ),
    p AS (
      SELECT doc_id, b.pos AS pos, b.h1 AS h1, b.h2 AS h2 FROM bg
    ),
    c12 AS (SELECT h1, h2, COUNT(*) AS c12 FROM p GROUP BY 1, 2),
    c1 AS (SELECT h1, COUNT(*) AS c1 FROM p GROUP BY 1),
    j AS (
      SELECT p.doc_id, p.pos,
             CAST(c12.c12 AS DOUBLE) / CAST(c1.c1 AS DOUBLE) AS pr
      FROM p
      JOIN c12 ON p.h1 = c12.h1 AND p.h2 = c12.h2
      JOIN c1 ON p.h1 = c1.h1
    )
    SELECT doc_id,
      COUNT(*) AS n_bigrams,
      CAST(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                    list(pr ORDER BY pos)),
                       (acc, v) -> acc + v)
           / CAST(COUNT(*) AS DOUBLE) AS DOUBLE) AS mean_cond_prob
    FROM j GROUP BY doc_id
    """,
    doc="Corpus-trained bigram language-model quality score (the "
    "CCNet/KenLM filtering shape): bigram and unigram-context "
    "counts over the WHOLE corpus train the model, and each "
    "document scores the arithmetic mean of its bigrams' "
    "conditional probabilities c(w1,w2)/c(w1) — fluent, "
    "corpus-typical text scores high; rare or shuffled word "
    "sequences score low.  The mean of exact count RATIOS replaces "
    "log-perplexity deliberately: ln() is transcendental and a "
    "1-ULP libm disagreement between engines would break the value "
    "gate, while integer-valued doubles divide bit-identically "
    "everywhere (the de-transcendentalization doctrine; production "
    "swaps in a KenLM pandas UDF for true perplexity, same plan "
    "shape).  Scale: words hash ONCE per doc (the shingle_hashes "
    "pattern — no per-bigram string materialization); the two "
    "count tables and the probability rejoin are map-side-combined "
    "integer-key shuffles, linear in corpus bigrams; the per-doc "
    "mean folds ~doc-length elements in position order "
    "(bit-reproducible, many small groups — never few-huge).",
)
def curation_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import posexplode_outer

    d = load_table(spark, sf_dir, "documents")
    words = "split(text, ' ')"
    wh = f"transform({words}, w -> {spark_polyhash('w')})"
    # filter BEFORE building the hash array: a filter on the derived
    # array would be pushed through the projection and re-hash every
    # word a second time (the explode_nonempty trap).
    t = (
        d.where(F.expr(f"size({words}) >= 2"))
        .withColumn("__hs", F.expr(wh))
        .select("doc_id", "__hs")
    )
    bigrams = (
        "transform(sequence(1, size(__hs) - 1), i -> "
        "struct(element_at(__hs, i) as h1, "
        "element_at(__hs, i + 1) as h2))"
    )
    pairs = (
        t.select("doc_id", posexplode_outer(F.expr(bigrams)))
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            F.col("col.h1").alias("h1"),
            F.col("col.h2").alias("h2"),
        )
    )
    c12 = pairs.groupBy("h1", "h2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = pairs.groupBy("h1").agg(F.count(F.lit(1)).alias("c1"))
    pr = F.col("c12").cast("double") / F.col("c1").cast("double")
    j = (
        pairs.join(c12, ["h1", "h2"])
        .join(c1, ["h1"])
        .select("doc_id", "pos", pr.alias("pr"))
    )
    return (
        j.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.expr(
                "aggregate(array_sort(collect_list(struct(pos, pr))), "
                "cast(0.0 as double), (acc, x) -> acc + x.pr)"
            ).alias("__sum"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            (F.col("__sum") / F.col("n_bigrams").cast("double")).alias(
                "mean_cond_prob"
            ),
        )
    )
