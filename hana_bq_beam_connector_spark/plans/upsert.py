"""Key-based merge/upsert (the connector's missing UPDATE story).

The reference can only APPEND (BigQueryIO WRITE_APPEND,
HanaToBQ.java:256-259); re-copying a mutated source row duplicates
it.  This operator provides the standard lakehouse merge: new
snapshot rows win by key, unmatched existing rows survive.

Plan shape: one full-outer hash join on the key + coalesce — a
single shuffle of both sides.  At 100 TB the existing side should be
bucketed on the key (sinks_bucketed.py) so only the (much smaller)
update snapshot shuffles; with a transactional table format (Delta/
Iceberg) this same logical plan becomes their MERGE INTO.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    existing: DataFrame, updates: DataFrame, key: str
) -> DataFrame:
    """Rows from ``updates`` replace same-key rows of ``existing``;
    all other existing rows pass through unchanged.  Schemas must
    match."""
    cols = existing.columns
    if updates.columns != cols:
        raise ValueError(
            f"schema mismatch: {updates.columns} vs {cols}"
        )
    e = existing.select(
        F.col(key).alias("__k"),
        F.struct(*cols).alias("__e"),
    )
    u = updates.select(
        F.col(key).alias("__k"),
        F.struct(*cols).alias("__u"),
    )
    merged = e.join(u, on="__k", how="full_outer").select(
        F.coalesce(F.col("__u"), F.col("__e")).alias("__row")
    )
    return merged.select(*[F.col(f"__row.{c}").alias(c) for c in cols])
