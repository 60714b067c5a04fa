"""Iterative BPE training: the distributed trainer must agree rule
for rule — and segmentation for segmentation — with a pure-Python
reference implementation of the same greedy algorithm (count desc,
lexicographic pair tie-break, leftmost non-overlapping merge)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from hana_bq_beam_connector_spark.operators.bpe import bpe_train
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


def test_bpe_train_early_stop(spark):
    """All-distinct single-char words have no pair reaching
    min_pair_count=2 — training must stop with zero rules."""
    docs = spark.createDataFrame([("a b c d",)], ["text"])
    rules, vocab = bpe_train(docs, "text", n_merges=5)
    assert rules == []
    assert vocab.count() == 4
