"""CDC apply — fold an insert/update/delete change batch into a base
snapshot (the tombstone half the reference's append-only 'CDC' lacks,
HanaToBQ.java:206-218 + 256-259).

Semantics: for each key, a ``D`` row removes it, a ``U`` row replaces
its payload, an ``I`` row adds a new key.  Deletes take precedence
over updates on the same key within one batch (apply order
D > U — the conventional compaction rule when a batch carries both).
A batch may carry at most ONE surviving (U/I) row per key — otherwise
the output would no longer be a valid keyed snapshot and the next
apply's anti-join would misbehave; pass ``seq_col`` to resolve
multi-row keys last-wins, or the default validation raises.

Plan shape: the base anti-joins the touched-key set (one
co-partitioned shuffle where only the *change batch's keys* move for
the broadcastable case — Spark broadcasts the small side of the anti
join automatically under AQE), then unions the surviving change rows.
No window, no global sort; with the base bucketed on the key the
exchange on the 100 TB side disappears.  The change batch is O(delta),
so at scale the whole apply is bounded by delta size, not table size
(the uniqueness validation is likewise one count over the delta).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
    seq_col: str | None = None,
    validate: bool = True,
) -> DataFrame:
    """Apply a single CDC batch to ``base``.

    ``changes`` carries the base's columns plus ``op_col`` in
    ('D', 'U', 'I') and optionally ``seq_col``.  Returns the
    post-apply snapshot with the base's schema.

    ``seq_col``: monotonic per-key sequence (log offset, LSN); the
    batch resolves TRUE last-wins per key across ALL ops — a D at a
    lower sequence than a later I/U does NOT delete the key (the log's
    final operation decides its fate; a delete-then-reinsert batch
    keeps the reinsert).  Ties on equal sequence break by op
    precedence U > I > D, deterministically and without ordering by
    payload columns (so unorderable payload types like maps stay
    supported); rows tying on (key, seq, op) have no deterministic
    winner, so ``validate=True`` (default) raises on them — one
    delta-bounded check, never touching the base.  Without ``seq_col``, D beats U/I within the batch
    (the conventional compaction rule) and ``validate=True`` (default)
    raises on multi-U/I keys instead of silently emitting a
    duplicate-key snapshot — an eager driver-side check costing one
    extra aggregation over the DELTA (never the base); streaming
    callers that cannot afford it pass a seq_col or validate=False.
    """
    cols = base.columns
    allowed = (*cols, op_col) + ((seq_col,) if seq_col else ())
    extra = [c for c in changes.columns if c not in allowed]
    if extra:
        raise ValueError(f"unexpected change columns: {extra}")
    if seq_col is not None:
        # Last-op-wins: one row per key survives the window (op
        # precedence 'U' > 'I' > 'D' on seq ties via string descent);
        # its op then routes the key to delete or upsert.
        if validate:
            # Two rows tying on (key, seq, op) with different payloads
            # make the winner arbitrary — the snapshot would not be
            # reproducible across replays.  Same eager delta-bounded
            # check as the no-seq branch: detect a non-unique maximum.
            w_top = Window.partitionBy(key)
            top_key = F.struct(F.col(seq_col), F.col(op_col))
            amb = (
                changes.withColumn("_cdc_top", F.max(top_key).over(w_top))
                .where(top_key == F.col("_cdc_top"))
                .groupBy(key)
                .count()
                .where(F.col("count") > 1)
                .limit(1)
                .count()
            )
            if amb:
                raise ValueError(
                    "apply_cdc: change batch carries rows tying on "
                    f"({key!r}, {seq_col!r}, {op_col!r}) — the winner "
                    "would be arbitrary and the snapshot not "
                    "reproducible on replay.  Use a finer sequence "
                    "(LSN, not second-granularity timestamps) or "
                    "pre-dedupe the batch."
                )
        w = Window.partitionBy(key).orderBy(
            F.col(seq_col).desc(), F.col(op_col).desc()
        )
        latest = (
            changes.withColumn("_cdc_rn", F.row_number().over(w))
            .where(F.col("_cdc_rn") == 1)
            .drop("_cdc_rn")
        )
        survivors = latest.where(F.col(op_col).isin("U", "I"))
        touched = changes.select(key).distinct()
        kept = base.join(touched, on=key, how="left_anti")
        return kept.unionByName(survivors.select(*cols))
    deletes = changes.where(F.col(op_col) == "D").select(key).distinct()
    # D wins over U on the same key: drop updates whose key is deleted.
    survivors = changes.where(F.col(op_col).isin("U", "I")).join(
        deletes, on=key, how="left_anti"
    )
    if validate:
        dup = (
            survivors.groupBy(key)
            .count()
            .where(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise ValueError(
                "apply_cdc: change batch carries multiple U/I rows for "
                f"one {key!r} and no seq_col was given — the result "
                "would not be a valid keyed snapshot.  Pass seq_col "
                "for last-wins resolution or pre-dedupe the batch."
            )
    touched = changes.select(key).distinct()
    kept = base.join(touched, on=key, how="left_anti")
    return kept.unionByName(survivors.select(*cols))
