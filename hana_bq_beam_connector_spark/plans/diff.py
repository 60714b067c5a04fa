"""Snapshot diff — table-level change detection between two keyed
snapshots (the audit half of a CDC story).

The reference copies windows append-only (HanaToBQ.java:246-260); it
can never answer "what changed between yesterday's copy and today's".
This operator reduces two snapshots to their delta: rows only in the
new snapshot (``added``), only in the old (``removed``), or present in
both with differing compare-column values (``changed``).  Unchanged
rows are filtered out immediately after the join, so the operator's
output is the delta sliver, never a second copy of the table.

Plan shape: one co-partitioned full-outer hash join on the key — each
side shuffles once; with both snapshots bucketed on the key
(sinks_bucketed.py) the plan is exchange-free.  Null-safe equality
(``<=>``) on the compare columns so NULL→value and value→NULL edits
count as changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare: list[str],
) -> DataFrame:
    """Delta between two snapshots keyed by ``key``.

    Returns one row per added/removed/changed key with columns
    ``(key, change_type, old_<c>, new_<c> ...)`` — for the default
    single compare column the outputs are ``old_priority``-style
    aliases chosen by the caller via a post-select; here they are
    ``old_<col>``/``new_<col>``.
    """
    o = old.select(
        F.col(key).alias("__k"), F.struct(*compare).alias("__o")
    )
    n = new.select(
        F.col(key).alias("__k"), F.struct(*compare).alias("__n")
    )
    joined = o.join(n, on="__k", how="full_outer")
    change = (
        F.when(F.col("__o").isNull(), F.lit("added"))
        .when(F.col("__n").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
    )
    unchanged = F.col("__o").isNotNull() & F.col("__n").isNotNull()
    for c in compare:
        unchanged = unchanged & F.col(f"__o.{c}").eqNullSafe(F.col(f"__n.{c}"))
    out = joined.where(~unchanged).select(
        F.col("__k").alias(key),
        change.alias("change_type"),
        *[F.col(f"__o.{c}").alias(f"old_{c}") for c in compare],
        *[F.col(f"__n.{c}").alias(f"new_{c}") for c in compare],
    )
    return out
