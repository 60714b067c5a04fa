"""Text-analysis operators (LLM-data surface): token stats, language
ID, quality scoring, fingerprinting, n-grams, TF-IDF.

Everything is built-in SQL functions over the tokenized text —
codegen'd, no Python — so the same pipeline runs unchanged over 10^9
documents; the only shuffles are the explicit groupBys (term counts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hana_bq_beam_connector_spark.functions.hashing import spark_polyhash
from hana_bq_beam_connector_spark.operators._common import spread

# Tiny per-language stopword seeds for the n-gram/stopword-ratio
# heuristic language scorer.  Real corpora would load fastText or CLD3
# via mapInPandas; the heuristic keeps the oracle SQL-expressible.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "y", "que", "en", "los"],
    "de": ["der", "die", "das", "und", "zu", "den", "ist"],
    "fr": ["le", "la", "de", "et", "les", "des", "un"],
}


def tokens(text_col: str) -> Column:
    """Whitespace tokenization (lowered)."""
    return F.split(F.lower(F.col(text_col)), r"\s+")


def token_count(text_col: str) -> Column:
    return F.size(tokens(text_col)).cast("long")


def stopword_hits(text_col: str, lang: str) -> Column:
    """How many tokens are in ``lang``'s stopword list."""
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return F.expr(
        f"size(filter(split(lower({text_col}), '\\\\s+'), "
        f"t -> array_contains(array({words}), t)))"
    ).cast("long")


def language_scores(df: DataFrame, text_col: str) -> DataFrame:
    """Stopword-ratio score per language + argmax prediction.

    Ties broken by language code ascending (deterministic)."""
    out = df
    for lang in STOPWORDS:
        out = out.withColumn(f"hits_{lang}", stopword_hits(text_col, lang))
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in STOPWORDS])
    pred = F.lit(None).cast("string")
    for lang in sorted(STOPWORDS, reverse=True):
        pred = F.when(F.col(f"hits_{lang}") == best, F.lit(lang)).otherwise(
            pred
        )
    return out.withColumn(
        "predicted_lang", F.when(best > 0, pred).otherwise(F.lit("und"))
    )


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Length / distinct-ratio / mean-token-length quality features and
    a linear quality score — exact integer-derived doubles."""
    toks = tokens(text_col)
    n_tok = F.size(toks).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    n_chars = F.length(F.col(text_col)).cast("long")
    distinct_ratio = n_distinct.cast("double") / n_tok.cast("double")
    mean_tok_len = (n_chars - (n_tok - 1)).cast("double") / n_tok.cast(
        "double"
    )
    score = (
        distinct_ratio * 0.5
        + F.least(n_tok.cast("double") / 100.0, F.lit(1.0)) * 0.5
    )
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("n_distinct_tokens", n_distinct)
        .withColumn("distinct_ratio", distinct_ratio)
        .withColumn("mean_token_len", mean_tok_len)
        .withColumn("quality_score", score)
    )


def fingerprint(df: DataFrame, text_col: str, out: str = "fingerprint") -> DataFrame:
    """Normalized-text rolling-hash document fingerprint: lowercase,
    collapse whitespace runs, polynomial hash — equal fingerprints ⇒
    byte-equal normalized docs (mod collisions at ~1e-9/pair)."""
    norm = f"regexp_replace(lower({text_col}), '\\\\s+', ' ')"
    return spread(df).withColumn(out, F.expr(spark_polyhash(norm)))


def word_ngrams(words_col: str, n: int) -> Column:
    """All word n-grams (with multiplicity) as an array column.

    ``words_col`` must be a *bound* array<string> column (tokenize
    once in a prior projection), not an inline ``split(...)`` — an
    inline expression would be re-evaluated inside every lambda call
    (``slice`` per position), turning O(words) per row into
    O(words²).  sequence(1, 0) would count *down* — guard short docs
    explicitly."""
    return F.expr(
        f"IF(size({words_col}) < {n}, array(), "
        f"transform(sequence(1, size({words_col}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({words_col}, i, {n}))))"
    )


def tf_idf_scores(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Deterministic TF-IDF variant: tf(term, doc) · N/df(term).

    The classical log() is not correctly-rounded across engines, so the
    raw rational N/df keeps ranking semantics and bit-exact oracles.
    Two shuffles: (doc, term) counts, then term document frequencies.

    df(term) is a COUNT window over the tf frame, not a groupBy +
    self-join: the join spelling consumed tf from two branches with
    different required distributions, so each branch re-ran the whole
    tokenize/explode scan (measured: two ~2 s stages at sf0.1, the
    query's dominant cost) and then paid a third exchange for the
    join.  The window reuses the single term-partitioned exchange the
    doc-frequency needs anyway — one tokenize pass, two exchanges
    total, identical integers out (guide §2.4).
    """
    from pyspark.sql.window import Window

    n_docs = df.count()  # driver-side scalar; one job
    terms = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = F.count(F.lit(1)).over(Window.partitionBy("term"))
    return tf.select(
        id_col,
        "term",
        "tf",
        dfreq.alias("df"),
    ).select(
        id_col,
        "term",
        "tf",
        "df",
        (
            F.col("tf").cast("double")
            * (F.lit(float(n_docs)) / F.col("df").cast("double"))
        ).alias("tfidf"),
    )


BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"


def bpe_ish_token_count(text_col: str) -> Column:
    """Pre-merge BPE-style token count: letter runs are one token,
    each digit and each non-alphanumeric char its own — the standard
    upper-bound estimate for subword tokenizer cost without shipping
    a merges table.  Pure regex, whole-stage codegen, same pattern
    replayed by the oracle."""
    return F.size(
        F.expr(f"regexp_extract_all({text_col}, '{BPE_ISH_PATTERN}', 0)")
    ).cast("long")
