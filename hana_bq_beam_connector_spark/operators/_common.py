"""Shared operator plumbing."""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def persist_reused(df: DataFrame) -> DataFrame:
    """Persist AND materialize (one count job, now) a frame that
    multiple downstream branches read — self-join sides, verify
    rejoins.

    Persist alone is not enough: broadcast exchanges evaluate eagerly
    in parallel driver threads, so both sides of a self-join start
    computing the shared lineage CONCURRENTLY before either fills the
    lazy cache — the full upstream recomputes once per branch anyway
    (measured 2.6× end-to-end on the embedding-dedup pipeline at
    sf0.1).  Forcing materialization first makes every branch read the
    cache.  MEMORY_AND_DISK — at 100 TB the materialized intermediate
    (ids + hashes, not raw text/vectors) spills to local disk instead
    of OOMing; this is the stage checkpoint a production dedup
    pipeline would persist anyway."""
    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    return out


def explode_nonempty(col):
    """``explode`` for array columns the caller guarantees non-empty
    and non-null — spelled as ``explode_outer`` to dodge a Catalyst
    performance trap.

    For a plain ``explode``, ``InferFiltersFromGenerate`` adds
    ``size(arr) > 0 AND arr IS NOT NULL`` above the child, and
    ``PushDownPredicates`` then pushes that filter through the
    projections that *define* the array, substituting the full array
    expression into the filter.  If the array is built from
    higher-order functions over a bound intermediate (e.g. per-word
    hashes), the substitution re-inlines the intermediate into every
    lambda reference — turning an O(words) projection into an
    O(words·k·words) filter evaluated per input row.  Measured on the
    5-gram decontamination query at sf0.1: 72 s → 2 s.  Outer
    generators are exempt from the infer rule, and on non-empty
    arrays ``explode_outer`` ≡ ``explode`` row-for-row."""
    from pyspark.sql import functions as F

    return F.explode_outer(col)


def posexplode_nonempty(col):
    """``posexplode`` variant of :func:`explode_nonempty` — same
    Catalyst trap, same non-empty/non-null caller contract."""
    from pyspark.sql import functions as F

    return F.posexplode_outer(col)


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to full cluster parallelism before
    CPU-heavy per-row work (hashing, vector folds) — but ONLY when the
    input is actually narrow.

    A small input — e.g. one parquet file under maxPartitionBytes —
    scans as ONE task, serializing compute on a single core while the
    rest of the cluster idles; there the repartition's shuffle is
    negligible next to the compute it parallelizes.  At 100 TB the
    scan already yields thousands of splits, and an unconditional
    ``repartition`` would shuffle every byte of text/vectors to fix a
    problem that no longer exists — so a frame already at (or past)
    cluster parallelism passes through untouched, keeping the dedup /
    similarity plans free of the round-robin Exchange (asserted in
    tests/test_plan_audit.py)."""
    sc = df.sparkSession.sparkContext
    parallelism = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= parallelism:
        return df
    return df.repartition(parallelism)
