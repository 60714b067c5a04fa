"""Text-analysis queries (SURVEY §2c text [X])."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hana_bq_beam_connector_spark.functions.hashing import duck_polyhash
from hana_bq_beam_connector_spark.operators._common import (
    explode_nonempty,
    posexplode_nonempty,
    spread,
)
from hana_bq_beam_connector_spark.operators.relational import topk_per_group
from hana_bq_beam_connector_spark.operators.text import (
    STOPWORDS,
    fingerprint,
    language_scores,
    quality_features,
    tf_idf_scores,
    word_ngrams,
)
from hana_bq_beam_connector_spark.queries import register
from hana_bq_beam_connector_spark.sources.files import load_table


@register(
    "text_token_stats",
    """
    SELECT doc_id,
      CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT)
        AS n_tokens,
      CAST(len(list_distinct(string_split_regex(lower(text), '\\s+')))
        AS BIGINT) AS n_distinct_tokens,
      CAST(length(text) AS BIGINT) AS n_chars_computed,
      n_chars AS n_chars_declared
    FROM documents
    """,
    doc="Token counting (whitespace tokenizer) + char counts, "
    "cross-checked against the declared n_chars column.",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), r"\s+")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias(
            "n_distinct_tokens"
        ),
        F.length("text").cast("long").alias("n_chars_computed"),
        F.col("n_chars").alias("n_chars_declared"),
    )


def _duck_stopword_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), "
        f"t -> list_contains([{words}], t))) AS BIGINT)"
    )


@register(
    "text_language_id",
    f"""
    WITH h AS (
      SELECT doc_id, lang,
        {", ".join(f"{_duck_stopword_hits(lang)} AS hits_{lang}" for lang in STOPWORDS)}
      FROM documents
    )
    SELECT doc_id, lang AS declared_lang,
      hits_en, hits_es, hits_de, hits_fr,
      CASE
        WHEN GREATEST(hits_en, hits_es, hits_de, hits_fr) = 0 THEN 'und'
        WHEN hits_de = GREATEST(hits_en, hits_es, hits_de, hits_fr) THEN 'de'
        WHEN hits_en = GREATEST(hits_en, hits_es, hits_de, hits_fr) THEN 'en'
        WHEN hits_es = GREATEST(hits_en, hits_es, hits_de, hits_fr) THEN 'es'
        ELSE 'fr'
      END AS predicted_lang
    FROM h
    """,
    doc="Heuristic language ID: stopword-hit argmax (ties resolved "
    "alphabetically); the SQL-expressible stand-in for an n-gram "
    "model, checked bit-for-bit.",
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    scored = language_scores(d.select("doc_id", "lang", "text"), "text")
    return scored.select(
        "doc_id",
        F.col("lang").alias("declared_lang"),
        "hits_en",
        "hits_es",
        "hits_de",
        "hits_fr",
        "predicted_lang",
    )


@register(
    "text_quality_features",
    """
    WITH t AS (
      SELECT doc_id,
        CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT)
          AS n_tokens,
        CAST(len(list_distinct(string_split_regex(lower(text), '\\s+')))
          AS BIGINT) AS n_distinct_tokens,
        CAST(length(text) AS BIGINT) AS n_chars
      FROM documents
    )
    SELECT doc_id, n_tokens, n_distinct_tokens,
      CAST(n_distinct_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        AS distinct_ratio,
      CAST(n_chars - (n_tokens - 1) AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        AS mean_token_len,
      CAST(n_distinct_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 0.5
        + LEAST(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
        AS quality_score
    FROM t
    """,
    doc="Quality scoring: distinct-token ratio, mean token length, "
    "linear quality score — the repetition/length heuristics used "
    "for corpus filtering, exact integer-derived doubles.",
)
def text_quality_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return quality_features(d.select("doc_id", "text"), "text").select(
        "doc_id",
        "n_tokens",
        "n_distinct_tokens",
        "distinct_ratio",
        "mean_token_len",
        "quality_score",
    )


_DUCK_NORM_TEXT = "regexp_replace(lower(text), '\\s+', ' ', 'g')"


@register(
    "text_fingerprint",
    f"""
    SELECT doc_id,
      {duck_polyhash(_DUCK_NORM_TEXT)}
        AS fingerprint
    FROM documents
    """,
    doc="Document fingerprint: rolling polynomial hash of the "
    "normalized text (lowercase, collapsed whitespace) — equal "
    "fingerprints <=> byte-equal normalized docs.",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return fingerprint(d.select("doc_id", "text"), "text").select(
        "doc_id", "fingerprint"
    )


@register(
    "text_bigram_topk",
    """
    SELECT bigram, n FROM (
      SELECT bigram, COUNT(*) AS n,
        ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, bigram) AS rn
      FROM (
        SELECT unnest(list_transform(
          range(1, greatest(len(w) - 1, 0) + 1),
          i -> array_to_string(list_slice(w, i, i + 1), ' '))) AS bigram
        FROM (SELECT string_split_regex(lower(text), '\\s+') AS w
              FROM documents)
      )
      GROUP BY bigram
    ) WHERE rn <= 20
    """,
    doc="Corpus-level top-20 word bigrams: explode -> count -> top-k "
    "(ties broken lexicographically).",
)
def text_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # Tokenize once per row, then filter BEFORE building n-grams so
    # the exploded array is provably non-empty (explode_nonempty
    # contract) and the short-doc guard stays on the cheap split.
    # spread: n-gram string building is CPU-bound; a single small
    # parquet split would otherwise serialize it on one core.
    t = (
        spread(d)
        .select(F.split(F.lower("text"), r"\s+").alias("__w"))
        .where(F.size("__w") >= 2)
    )
    exploded = t.select(
        explode_nonempty(word_ngrams("__w", 2)).alias("bigram")
    )
    counted = exploded.groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))
    return (
        counted.orderBy(F.col("n").desc(), F.col("bigram").asc())
        .limit(20)
        .select("bigram", "n")
    )


@register(
    "text_tfidf_topk",
    """
    WITH terms AS (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, term, tf, df, tfidf FROM (
      SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
        CAST(tf.tf AS DOUBLE) * (CAST(n.n_docs AS DOUBLE)
                                 / CAST(dfreq.df AS DOUBLE)) AS tfidf,
        ROW_NUMBER() OVER (
          PARTITION BY tf.doc_id
          ORDER BY CAST(tf.tf AS DOUBLE) * (CAST(n.n_docs AS DOUBLE)
                   / CAST(dfreq.df AS DOUBLE)) DESC, tf.term
        ) AS rn
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ) WHERE rn <= 3
    """,
    doc="TF-IDF (rational N/df variant — log() is not cross-engine "
    "reproducible): two shuffles (doc-term counts, term df), top-3 "
    "terms per doc.",
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    scores = tf_idf_scores(d.select("doc_id", "text"), "doc_id", "text")
    return topk_per_group(
        scores,
        partition_by=["doc_id"],
        order=[F.col("tfidf").desc(), F.col("term").asc()],
        k=3,
    ).select("doc_id", "term", "tf", "df", "tfidf")


@register(
    "text_bpe_token_count",
    """
    SELECT doc_id,
      CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
      CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]'))
           AS BIGINT) AS bpe_tokens,
      CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
    """,
    doc="Token counting, whitespace + BPE-ish regex (letter runs / "
    "single digits / punctuation chars) — the tokenizer-cost "
    "estimator for training-data budgeting; one codegen'd regex scan.",
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hana_bq_beam_connector_spark.operators.text import (
        bpe_ish_token_count,
        token_count,
    )

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count("text").alias("ws_tokens"),
        bpe_ish_token_count("text").alias("bpe_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


@register(
    "text_repetition_score",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    )
    SELECT doc_id,
      CAST(len(ws) AS BIGINT) AS n_tokens,
      CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct,
      CAST(len(ws) - len(list_distinct(ws)) AS BIGINT) AS n_repeated,
      CAST(CAST(len(list_distinct(ws)) AS DOUBLE)
           / CAST(len(ws) AS DOUBLE) AS DOUBLE) AS distinct_ratio
    FROM t
    WHERE len(ws) > 0
    """,
    doc="Repetition quality signal: token-level distinct ratio — the "
    "cheap filter for degenerate/looping text in training corpora; "
    "pure array arithmetic, one scan, no shuffle.",
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    t = d.select("doc_id", ws.alias("ws")).where(F.size("ws") > 0)
    n = F.size("ws").cast("long")
    nd = F.size(F.array_distinct("ws")).cast("long")
    return t.select(
        "doc_id",
        n.alias("n_tokens"),
        nd.alias("n_distinct"),
        (n - nd).alias("n_repeated"),
        (nd.cast("double") / n.cast("double")).alias("distinct_ratio"),
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"555-[0-9]{4}"
_DUCK_SYNTH = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || "
    "'@mail.example.com ref 555-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


@register(
    "text_pii_redact",
    f"""
    WITH s AS (
      SELECT doc_id, {_DUCK_SYNTH} AS synth FROM documents
    )
    SELECT doc_id,
      CAST(len(regexp_extract_all(synth, '{_EMAIL_RE}')) AS BIGINT)
        AS n_emails,
      CAST(len(regexp_extract_all(synth, '{_PHONE_RE}')) AS BIGINT)
        AS n_phones,
      regexp_replace(regexp_replace(synth, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                     '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
    FROM s
    """,
    doc="PII scrubbing: count + redact emails and phone-shaped tokens "
    "with codegen'd regex (JVM-side, zero Python).  The synthetic "
    "corpus has no PII, so a deterministic email/phone is derived "
    "from doc_id and appended identically in both engines before "
    "redaction — the redacted string itself is the checked value.  "
    "One scan, no shuffle; the pattern set is the plug-in point for "
    "real PII rulepacks.",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    synth = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com ref 555-"),
        F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(synth, _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    return d.select(
        "doc_id",
        F.regexp_count(synth, F.lit(_EMAIL_RE)).cast("long").alias(
            "n_emails"
        ),
        F.regexp_count(synth, F.lit(_PHONE_RE)).cast("long").alias(
            "n_phones"
        ),
        redacted.alias("redacted"),
    )


@register(
    "text_chunk_overlap",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE len(string_split(text, ' ')) > 0
    ),
    s AS (
      SELECT doc_id, w, unnest(range(0, len(w), 24)) AS start
      FROM t
    )
    SELECT doc_id,
      CAST(start // 24 AS BIGINT) AS chunk_id,
      CAST(len(list_slice(w, start + 1, start + 32)) AS BIGINT)
        AS n_chunk_tokens,
      array_to_string(list_slice(w, start + 1, start + 32), ' ')
        AS chunk_text
    FROM s
    """,
    doc="Context-window chunking: split each document into overlapping "
    "token windows (size 32, stride 24 — 8-token overlap), the "
    "standard pre-tokenization step for embedding/training pipelines. "
    "One scan, zero shuffle: windows are generated per-row with "
    "sequence+transform+posexplode (codegen'd array ops), so the "
    "operator scales linearly and preserves input partitioning.",
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    t = d.select("doc_id", toks.alias("w")).where(F.size("w") > 0)
    chunks = F.transform(
        F.sequence(F.lit(0), F.size("w") - 1, F.lit(24)),
        lambda s: F.slice(F.col("w"), s + 1, 32),
    )
    # size(w) > 0 above guarantees >= 1 window per row.
    e = t.select(
        "doc_id", posexplode_nonempty(chunks).alias("chunk_id", "chunk")
    )
    return e.select(
        "doc_id",
        F.col("chunk_id").cast("long"),
        F.size("chunk").cast("long").alias("n_chunk_tokens"),
        F.array_join("chunk", " ").alias("chunk_text"),
    )


@register(
    "text_inverted_index",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(text), '\\s+')) AS term
      FROM documents
    ),
    stats AS (
      SELECT term,
             COUNT(DISTINCT doc_id) AS df,
             COUNT(*) AS tf
      FROM toks GROUP BY term
    ),
    top AS (SELECT * FROM stats ORDER BY df DESC, term LIMIT 20)
    SELECT t.term, t.df, t.tf,
           array_to_string(
             list_slice(list_sort(list(DISTINCT x.doc_id)), 1, 5), ','
           ) AS sample_postings
    FROM top t JOIN toks x USING (term)
    GROUP BY t.term, t.df, t.tf
    """,
    doc="Inverted-index build (search-engine posting lists): explode "
    "tokens, aggregate document frequency + term frequency per term, "
    "keep the 20 highest-df terms (ties by term), then fetch the 5 "
    "smallest doc ids as a posting sample for just those terms.  "
    "Postings are materialized ONLY for the selected terms via a "
    "broadcast semi-join back onto the token stream — collecting a "
    "full posting array per term during the stats pass would hold "
    "unbounded per-key state exactly on the skewed (stopword) keys; "
    "df/tf instead partial-aggregate map-side, so hot terms cost "
    "O(#partitions), not O(#occurrences), through the exchange.  "
    "The posting sample is emitted as a comma-joined STRING (sorted "
    "numerically before the join) — the driver's pandas canonicalizer "
    "cannot hash list-valued cells, and the registry guarantees "
    "flat-typed outputs (see tests/test_registry_schemas.py).",
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = spread(d).select(
        "doc_id", explode_nonempty(F.split(F.lower("text"), r"\s+")).alias("term")
    )
    stats = toks.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"),
        F.count(F.lit(1)).alias("tf"),
    )
    top = stats.orderBy(F.col("df").desc(), "term").limit(20)
    postings = (
        toks.join(F.broadcast(top.select("term")), "term")
        .groupBy("term")
        .agg(
            F.array_join(
                F.transform(
                    F.slice(F.sort_array(F.collect_set("doc_id")), 1, 5),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("sample_postings")
        )
    )
    return top.join(postings, "term")


@register(
    "text_vocab_mincount",
    """
    SELECT term, CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM (
      SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS term
      FROM documents
    )
    GROUP BY term HAVING COUNT(*) >= 10
    """,
    doc="Tokenizer-training vocabulary build: corpus term frequencies "
    "+ document frequencies with a min-count cutoff — the first step "
    "of every subword-tokenizer training run.  Explode + hash agg on "
    "the term: partial aggregation collapses each partition to its "
    "(bounded-vocabulary) distinct terms map-side, so the exchange "
    "carries O(vocab x partitions) rows, not O(tokens) — at 100 TB "
    "the token stream never shuffles.",
)
def text_vocab_mincount(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = spread(d).select(
        "doc_id",
        explode_nonempty(F.split(F.lower("text"), r"\s+")).alias("term"),
    )
    return (
        toks.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .where(F.col("n_total") >= 10)
    )


@register(
    "text_bpe_pair_merge",
    """
    SELECT pair, n, rank FROM (
      SELECT pair, CAST(COUNT(*) AS BIGINT) AS n,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, pair) AS rank
      FROM (
        SELECT unnest(list_transform(range(1, length(w)),
                                     i -> substr(w, i, 2))) AS pair
        FROM (
          SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
          FROM documents
        ) WHERE length(w) >= 2
      )
      GROUP BY pair
    ) WHERE rank <= 20
    """,
    doc="BPE training inner loop (one merge round): count adjacent "
    "symbol-pair frequencies across every word occurrence in the "
    "corpus; the top pair is the next merge.  The pair domain is "
    "bounded by the symbol alphabet squared, so partial aggregation "
    "collapses each partition to a tiny pair map before the single "
    "exchange — corpus-size-independent shuffle, which is what makes "
    "distributed BPE training rounds viable at 100 TB.  (substring "
    "per position is O(len) on short words; symbols here are chars — "
    "later rounds would operate on merged-symbol arrays.)",
)
def text_bpe_pair_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    words = spread(d).select(
        explode_nonempty(F.split(F.lower("text"), r"\s+")).alias("w")
    ).where(F.length("w") >= 2)
    pairs = words.select(
        explode_nonempty(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    counted = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.col("n").desc(), "pair")
    return (
        counted.select("pair", "n", F.row_number().over(w).cast("long").alias("rank"))
        .where(F.col("rank") <= 20)
    )


_BM25_TERMS = ("spark", "vector", "window")
_BM25_K1 = "1.2"
_BM25_B = "0.75"


def _bm25_score(tf_fn) -> str:
    """Engine-shared BM25 spelling; ``tf_fn(term) -> SQL`` supplies the
    engine's term-frequency expression.  Identical operation order on
    both sides (every op is one correctly-rounded IEEE step), so the
    doubles — and the ranking — hash-match."""
    avgdl = "(CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    terms = []
    for t in _BM25_TERMS:
        tf = tf_fn(t)
        idf = (
            f"((CAST(n_docs AS DOUBLE) - CAST(df_{t} AS DOUBLE) + 0.5)"
            f" / (CAST(df_{t} AS DOUBLE) + 0.5))"
        )
        denom = (
            f"({tf} + {_BM25_K1} * ((1.0 - {_BM25_B}) + {_BM25_B} * "
            f"(CAST(dl AS DOUBLE) / {avgdl})))"
        )
        terms.append(f"({idf} * (({tf} * ({_BM25_K1} + 1.0)) / {denom}))")
    return " + ".join(terms)


def _bm25_df_aggs(contains_fn) -> str:
    return ", ".join(
        f"CAST(SUM(CASE WHEN {contains_fn(t)} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS df_{t}"
        for t in _BM25_TERMS
    )


@register(
    "search_bm25_topk",
    f"""
    WITH docs AS (
      SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
      FROM documents
    ),
    d2 AS (
      SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM docs
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS sum_dl,
             {_bm25_df_aggs(lambda t: f"list_contains(toks, '{t}')")}
      FROM d2
    ),
    scored AS (
      SELECT doc_id,
        {_bm25_score(lambda t: f"CAST(len(list_filter(toks, x -> x = '{t}')) AS DOUBLE)")}
          AS bm25
      FROM d2, stats
    )
    SELECT doc_id, bm25, rank FROM (
      SELECT doc_id, bm25,
             ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rank
      FROM scored
    ) WHERE rank <= 20
    """,
    doc="BM25 full-text retrieval: top-20 documents for a fixed "
    "3-term query.  Corpus stats (N, total length, per-term df) "
    "reduce to ONE row that broadcasts back over the corpus — the "
    "scoring pass is a single scan with zero joins on the heavy "
    "side; the final top-k is the only (tiny) ordered exchange.  The "
    "idf uses the rational (N - df + 0.5)/(df + 0.5) form — the "
    "classic log idf is a monotone transform per term but ln() is "
    "libm-dependent, and cross-engine bit-equality of every score "
    "matters more here than the textbook spelling.  All arithmetic "
    "is IEEE ops in char-identical order on both engines.",
)
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.lower(F.col("text")), r"\s+")
    docs = spread(d).select(
        "doc_id", toks.alias("toks"), F.size(toks).cast("long").alias("dl")
    )
    stats = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
        *[
            F.sum(
                F.when(F.array_contains("toks", t), 1).otherwise(0)
            ).cast("long").alias(f"df_{t}")
            for t in _BM25_TERMS
        ],
    )
    score = _bm25_score(
        lambda t: f"CAST(size(filter(toks, x -> x = '{t}')) AS DOUBLE)"
    )
    scored = docs.join(F.broadcast(stats)).select(
        "doc_id", F.expr(score).alias("bm25")
    )
    w = Window.orderBy(F.col("bm25").desc(), "doc_id")
    return (
        scored.select("doc_id", "bm25", F.row_number().over(w).cast("long").alias("rank"))
        .where(F.col("rank") <= 20)
    )
