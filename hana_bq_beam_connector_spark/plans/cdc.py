"""CDC apply — fold an insert/update/delete change batch into a base
snapshot (the tombstone half the reference's append-only 'CDC' lacks,
HanaToBQ.java:206-218 + 256-259).

Semantics: for each key, a ``D`` row removes it, a ``U`` row replaces
its payload, an ``I`` row adds a new key.  Deletes take precedence
over updates on the same key within one batch (apply order
D > U — the conventional compaction rule when a batch carries both).

Plan shape: the base anti-joins the touched-key set (one
co-partitioned shuffle where only the *change batch's keys* move for
the broadcastable case — Spark broadcasts the small side of the anti
join automatically under AQE), then unions the surviving change rows.
No window, no global sort; with the base bucketed on the key the
exchange on the 100 TB side disappears.  The change batch is O(delta),
so at scale the whole apply is bounded by delta size, not table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply a single CDC batch to ``base``.

    ``changes`` carries the base's columns plus ``op_col`` in
    ('D', 'U', 'I').  Returns the post-apply snapshot with the base's
    schema.
    """
    cols = base.columns
    extra = [c for c in changes.columns if c not in (*cols, op_col)]
    if extra:
        raise ValueError(f"unexpected change columns: {extra}")
    deletes = changes.where(F.col(op_col) == "D").select(key).distinct()
    # D wins over U on the same key: drop updates whose key is deleted.
    survivors = changes.where(F.col(op_col).isin("U", "I")).join(
        deletes, on=key, how="left_anti"
    )
    touched = changes.select(key).distinct()
    kept = base.join(touched, on=key, how="left_anti")
    return kept.unionByName(survivors.select(*cols))
