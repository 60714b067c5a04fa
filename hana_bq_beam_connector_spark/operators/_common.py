"""Shared operator plumbing."""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def persist_reused(df: DataFrame) -> DataFrame:
    """Persist a frame that multiple downstream branches read (self-join
    sides, verify rejoins): without it Spark recomputes the full lineage
    once per branch.  MEMORY_AND_DISK — at 100 TB the materialized
    intermediate (ids + hashes, not raw text/vectors) spills to local
    disk instead of OOMing, which is exactly the stage-materialization
    a production dedup pipeline would checkpoint anyway."""
    return df.persist(StorageLevel.MEMORY_AND_DISK)


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
