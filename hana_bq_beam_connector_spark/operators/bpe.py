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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
