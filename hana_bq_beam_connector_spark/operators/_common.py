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


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to full cluster parallelism before
    CPU-heavy per-row work (hashing, vector folds).

    A small input — e.g. one parquet file under maxPartitionBytes —
    scans as ONE task, serializing compute on a single core while the
    rest of the cluster idles.  The repartition's shuffle is negligible
    next to the compute it parallelizes.  At 100 TB the scan already
    yields thousands of splits, so this only rebalances."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)
