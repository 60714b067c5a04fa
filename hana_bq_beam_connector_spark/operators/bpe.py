"""Iterative BPE tokenizer training (SURVEY §2c tokenizer training
[X] — the full greedy loop on top of the oracle-gated single-round
pair statistics in queries/text.py).

Classic byte-pair-encoding training, distributed the way it scales:

* the corpus reduces ONCE to the (word, count) vocabulary — BPE
  statistics are identical on the weighted vocab and the raw token
  stream, and the vocab is bounded by distinct words, not corpus
  size, so every later round runs on a frame that fits in a few
  partitions at any corpus scale;
* each round's pair count is an explode + hash aggregate whose domain
  is bounded by (current alphabet)², partial-aggregated map-side —
  the exchange carries pair partials, never token streams;
* the argmax merge rule is ONE collected row per round (the classic
  driver-side loop: bounded data to the driver, decisions broadcast
  back into the next round's expressions);
* applying a merge is a codegen'd ``aggregate`` fold over each word's
  symbol array (leftmost non-overlapping, exactly the reference BPE
  semantics) — zero Python in the distributed path.

Determinism: ties on pair count break lexicographically on the pair,
so the learned merge table is unique; a pure-Python reference
implementation replays the identical algorithm in
tests/test_bpe_train.py and must agree exactly.
"""

from __future__ import annotations

import heapq
from collections import Counter, defaultdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hana_bq_beam_connector_spark.operators._common import (
    persist_reused,
    plan_reset,
)


def _sql_quote(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _merge_fold(syms_col: str, left: str, right: str) -> str:
    """Leftmost non-overlapping merge of (left, right) -> left||right
    over a symbol array, as one aggregate fold."""
    ql, qr = _sql_quote(left), _sql_quote(right)
    qlr = _sql_quote(left + right)
    return (
        f"aggregate({syms_col}, cast(array() as array<string>), "
        f"(acc, x) -> CASE WHEN size(acc) > 0 "
        f"AND element_at(acc, -1) = {ql} AND x = {qr} "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array({qlr})) "
        f"ELSE concat(acc, array(x)) END)"
    )


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 10,
    min_pair_count: int = 2,
    checkpoint_dir: str | None = None,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merge rules from a text column.

    Returns ``(rules, vocab)``: the ordered merge table as
    ``[(left, right, pair_count), ...]`` and the final vocabulary
    frame ``(word, wcount, syms)`` with each word segmented by the
    learned rules.  Training stops early when no pair reaches
    ``min_pair_count``.
    """
    words = df.select(
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w")
    ).where(F.length("w") >= 1)
    vocab = persist_reused(
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("wcount"))
        .withColumn(
            "syms",
            F.expr(
                "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
            ),
        )
    )
    rules: list[tuple[str, str, int]] = []
    prev = vocab
    for rnd in range(n_merges):
        pairs = (
            prev.where(F.expr("size(syms) >= 2"))
            .select(
                "wcount",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> struct(element_at(syms, i) AS l, "
                        "element_at(syms, i + 1) AS r))"
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("wcount").alias("n"))
        )
        top = pairs.orderBy(F.col("n").desc(), "l", "r").limit(1).collect()
        if not top or top[0]["n"] < min_pair_count:
            break
        left, right, n = top[0]["l"], top[0]["r"], int(top[0]["n"])
        rules.append((left, right, n))
        merged = prev.withColumn(
            "syms", F.expr(_merge_fold("syms", left, right))
        )
        # Each round nests one more fold into the projection; persist
        # truncates recompute and the rationed plan_reset keeps the
        # expression tree from growing past what codegen tolerates.
        if (rnd + 1) % 4 == 0:
            nxt = plan_reset(merged, checkpoint_dir)
        else:
            nxt = persist_reused(merged)
        prev.unpersist()
        prev = nxt
    return rules, prev


def _merge_word(syms: list[str], left: str, right: str) -> list[str]:
    """Leftmost non-overlapping merge — the pure-Python twin of
    ``_merge_fold`` (identical semantics, property-locked in
    tests/test_bpe_train.py)."""
    out: list[str] = []
    for x in syms:
        if out and out[-1] == left and x == right:
            out[-1] = left + right
        else:
            out.append(x)
    return out


def _greedy_merges(
    word_counts: dict[str, int], n_merges: int, min_pair_count: int
) -> tuple[list[tuple[str, str, int]], dict[str, list[str]]]:
    """The greedy BPE loop on a weighted vocabulary, driver-side.

    Incremental pair maintenance: a lazy-deletion heap picks each
    round's argmax in O(log P) and only words CONTAINING the merged
    pair are re-counted — the classic trainer structure, ~O(total
    merge work), not O(n_merges × vocab).  Selection order (count
    desc, pair lexicographic asc) is bit-identical to ``bpe_train``'s
    distributed argmax, so the two trainers learn the same table.
    """
    vocab = {w: list(w) for w in word_counts}
    pair_counts: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)
    for w, c in word_counts.items():
        syms = vocab[w]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] += c
            pair_words[p].add(w)
    # Min-heap on (-count, pair): top = highest count, lex-least pair.
    heap = [(-n, p) for p, n in pair_counts.items()]
    heapq.heapify(heap)

    def _push(p: tuple[str, str]) -> None:
        heapq.heappush(heap, (-pair_counts[p], p))

    rules: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        # Lazy deletion: skip heap entries whose count is stale.
        top = None
        while heap:
            negn, p = heapq.heappop(heap)
            if pair_counts.get(p, 0) == -negn:
                top = (p, -negn)
                break
        if top is None or top[1] < min_pair_count:
            break
        (left, right), n = top
        rules.append((left, right, n))
        # pair_words holds stale members (words rewritten since they
        # were indexed); containment is re-checked via the actual
        # count delta below.
        for w in pair_words.pop((left, right), ()):
            old = vocab[w]
            new = _merge_word(old, left, right)
            if len(new) == len(old):
                continue  # stale index entry — pair no longer here
            c = word_counts[w]
            touched = set()
            for i in range(len(old) - 1):
                p = (old[i], old[i + 1])
                pair_counts[p] -= c
                if pair_counts[p] == 0:
                    del pair_counts[p]
                touched.add(p)
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                pair_counts[p] += c
                pair_words[p].add(w)
                touched.add(p)
            vocab[w] = new
            for p in touched:
                if p in pair_counts:
                    _push(p)
        pair_counts.pop((left, right), None)
    return rules, vocab


def bpe_segment(
    df: DataFrame,
    word_col: str,
    rules: list[tuple[str, str, int]],
    out_col: str = "syms",
) -> DataFrame:
    """Apply a learned merge table to a word column, distributed.

    One Arrow-batched pandas UDF replays the rules in rank order with
    leftmost non-overlapping semantics — exactly ``_merge_fold`` —
    skipping rules whose symbols cannot occur in the word (O(1) set
    probes), so cost is ~O(rules present + merges done) per word, not
    O(rules × len).  This is the declared Python swap point: a 32k-rule
    table cannot nest as codegen folds, and at 100 TB the application
    pass is embarrassingly parallel with the bounded rule table
    shipped once per executor in the UDF closure.
    """
    ordered = [(l, r) for l, r, _ in rules]

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _seg(words):  # type: ignore[no-untyped-def]
        import pandas as pd

        out = []
        for w in words:
            if w is None:
                out.append(None)
                continue
            syms = list(w)
            present = set(syms)
            for left, right in ordered:
                if left not in present or right not in present:
                    continue
                merged = _merge_word(syms, left, right)
                if len(merged) != len(syms):
                    syms = merged
                    present = set(syms)
            out.append(syms)
        return pd.Series(out)

    return df.withColumn(out_col, _seg(F.col(word_col)))


def bpe_train_local(
    df: DataFrame,
    text_col: str,
    n_merges: int = 10,
    min_pair_count: int = 2,
    max_vocab_words: int = 50_000_000,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Hybrid BPE trainer: distributed vocab, driver-side greedy loop.

    ``bpe_train`` runs one Spark job + one collect PER MERGE — fine
    for ten merges, but a real 32k-merge vocabulary is 32k job
    round-trips ≈ days of pure scheduling overhead.  This variant
    exploits the same invariant the distributed trainer already
    relies on: BPE statistics are identical on the (word, count)
    vocabulary, which is bounded by DISTINCT WORDS — corpus-size
    independent and driver-resident at any corpus scale (English
    web-scale corpora: low tens of millions of distinct
    whitespace-words; ``max_vocab_words`` guards the collect loudly).
    So: reduce the corpus to the weighted vocab in ONE distributed
    aggregate, collect it once, run the greedy loop in pure Python
    with incremental pair maintenance, and ship only the learned rule
    table back out — segmentation of the returned vocab (and of any
    corpus, via ``bpe_segment``) stays distributed.

    Returns the same ``(rules, vocab)`` contract as ``bpe_train`` and
    learns the identical merge table (equivalence-tested).
    """
    words = df.select(
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w")
    ).where(F.length("w") >= 1)
    vocab_df = persist_reused(
        words.groupBy("w").agg(F.count(F.lit(1)).alias("wcount"))
    )
    n_words = vocab_df.count()
    if n_words > max_vocab_words:
        raise ValueError(
            f"bpe_train_local: vocabulary has {n_words} distinct "
            f"words (> max_vocab_words={max_vocab_words}) — the "
            "driver-side greedy loop would not fit.  Raise the cap "
            "if the driver has memory for it, pre-filter rare words, "
            "or fall back to the fully distributed bpe_train."
        )
    word_counts = {
        r["w"]: r["wcount"] for r in vocab_df.collect()
    }
    rules, _ = _greedy_merges(word_counts, n_merges, min_pair_count)
    segmented = bpe_segment(vocab_df, "w", rules)
    return rules, segmented
