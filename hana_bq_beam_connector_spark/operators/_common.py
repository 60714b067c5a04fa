"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
