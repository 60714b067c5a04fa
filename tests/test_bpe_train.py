"""Iterative BPE training: the distributed trainer must agree rule
for rule — and segmentation for segmentation — with a pure-Python
reference implementation of the same greedy algorithm (count desc,
lexicographic pair tie-break, leftmost non-overlapping merge)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from hana_bq_beam_connector_spark.operators.bpe import (
    bpe_segment,
    bpe_train,
    bpe_train_local,
)
from tests.conftest import SF_DIR


def _ref_merge(syms, left, right):
    out = []
    for x in syms:
        if out and out[-1] == left and x == right:
            out[-1] = left + right
        else:
            out.append(x)
    return out


def _ref_bpe(word_counts, n_merges, min_pair_count):
    vocab = {w: [c for c in w] for w in word_counts}
    rules = []
    for _ in range(n_merges):
        counts = Counter()
        for w, c in word_counts.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += c
        if not counts:
            break
        (left, right), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if n < min_pair_count:
            break
        rules.append((left, right, n))
        for w in vocab:
            vocab[w] = _ref_merge(vocab[w], left, right)
    return rules, vocab


def test_bpe_train_matches_python_reference(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got_rules, got_vocab = bpe_train(docs, "text", n_merges=8)

    word_counts = Counter()
    for r in docs.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("w")
    ).collect():
        if len(r["w"]) >= 1:
            word_counts[r["w"]] += 1
    want_rules, want_vocab = _ref_bpe(word_counts, 8, 2)

    assert got_rules == want_rules and len(got_rules) == 8

    got_seg = {
        r["w"]: tuple(r["syms"])
        for r in got_vocab.select("w", "syms").collect()
    }
    assert got_seg == {w: tuple(s) for w, s in want_vocab.items()}
    # Counts survive the loop: vocabulary totals equal the corpus.
    n_tokens = sum(word_counts.values())
    assert (
        got_vocab.agg(F.sum("wcount")).collect()[0][0] == n_tokens
    )


def test_bpe_train_local_matches_distributed(spark):
    """The hybrid trainer (driver-side greedy loop over the collected
    weighted vocab) must learn the IDENTICAL merge table to the fully
    distributed trainer, and its pandas-UDF segmentation must equal
    the codegen-fold segmentation word for word."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    dist_rules, dist_vocab = bpe_train(docs, "text", n_merges=8)
    loc_rules, loc_vocab = bpe_train_local(docs, "text", n_merges=8)
    assert loc_rules == dist_rules

    dist_seg = {
        r["w"]: tuple(r["syms"])
        for r in dist_vocab.select("w", "syms").collect()
    }
    loc_seg = {
        r["w"]: tuple(r["syms"])
        for r in loc_vocab.select("w", "syms").collect()
    }
    assert loc_seg == dist_seg


def test_bpe_train_local_deep_vocab(spark):
    """A 300-merge table — infeasible as 300 Spark jobs — trains
    driver-side in one collect and still agrees with the pure-Python
    reference on rules AND segmentation."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rules, vocab = bpe_train_local(docs, "text", n_merges=300)

    word_counts = Counter()
    for r in docs.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("w")
    ).collect():
        if len(r["w"]) >= 1:
            word_counts[r["w"]] += 1
    want_rules, want_vocab = _ref_bpe(word_counts, 300, 2)
    assert rules == want_rules
    got_seg = {
        r["w"]: tuple(r["syms"])
        for r in vocab.select("w", "syms").collect()
    }
    assert got_seg == {w: tuple(s) for w, s in want_vocab.items()}


def test_bpe_train_local_vocab_cap(spark):
    docs = spark.createDataFrame([("a b c d e f",)], ["text"])
    try:
        bpe_train_local(docs, "text", n_merges=2, max_vocab_words=3)
        assert False, "expected ValueError on vocab cap"
    except ValueError as e:
        assert "max_vocab_words" in str(e)


def test_bpe_segment_null_and_skip(spark):
    """Null words pass through; rules whose symbols are absent are
    skipped without altering the segmentation."""
    df = spark.createDataFrame([("banana",), (None,)], ["w"])
    out = {
        r["w"]: r["syms"]
        for r in bpe_segment(
            df, "w", [("a", "n", 3), ("x", "y", 9), ("an", "an", 2)]
        ).collect()
    }
    assert out["banana"] == ["b", "anan", "a"]
    assert out[None] is None


def test_bpe_train_early_stop(spark):
    """All-distinct single-char words have no pair reaching
    min_pair_count=2 — training must stop with zero rules."""
    docs = spark.createDataFrame([("a b c d",)], ["text"])
    rules, vocab = bpe_train(docs, "text", n_merges=5)
    assert rules == []
    assert vocab.count() == 4
