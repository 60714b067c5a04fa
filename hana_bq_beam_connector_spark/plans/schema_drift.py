"""Schema-drift report — diff two dataset schemas before a copy run.

The reference aborts the whole job on any unknown column type
(HanaToBQ.java:129-132) and has no way to answer "what changed since
the last copy?".  This planner diffs two StructTypes (source vs sink,
or yesterday's snapshot vs today's) into added / removed /
type-changed columns, so an incremental pipeline can decide: widen
the sink (mergeSchema), quarantine the run, or proceed.

Driver-side metadata only — schemas are KBs at any data scale; no
job runs.  Nested fields are compared by dotted path so a drift deep
inside a struct is reported precisely, not as a whole-column change.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.types import ArrayType, DataType, MapType, StructType


@dataclass(frozen=True)
class SchemaDrift:
    added: tuple[tuple[str, str], ...]      # (path, new_type)
    removed: tuple[tuple[str, str], ...]    # (path, old_type)
    changed: tuple[tuple[str, str, str], ...]  # (path, old_type, new_type)

    @property
    def is_compatible_widening(self) -> bool:
        """True when the new schema only ADDS columns — the drift
        mergeSchema handles with row-wise NULL degradation."""
        return not self.removed and not self.changed

    @property
    def empty(self) -> bool:
        return not (self.added or self.removed or self.changed)


def _leaf_paths(dt: DataType, prefix: str = "") -> dict[str, str]:
    """Flatten a schema to {dotted path: simpleString} leaves;
    arrays/maps recurse into their element/value types under
    ``path.element`` / ``path.value`` so nested drift localizes."""
    if isinstance(dt, StructType):
        out: dict[str, str] = {}
        for f in dt.fields:
            p = f"{prefix}.{f.name}" if prefix else f.name
            out.update(_leaf_paths(f.dataType, p))
        return out
    if isinstance(dt, ArrayType):
        return _leaf_paths(dt.elementType, f"{prefix}.element")
    if isinstance(dt, MapType):
        out = _leaf_paths(dt.keyType, f"{prefix}.key")
        out.update(_leaf_paths(dt.valueType, f"{prefix}.value"))
        return out
    return {prefix: dt.simpleString()}


def schema_drift(old: StructType, new: StructType) -> SchemaDrift:
    """Diff two schemas into added/removed/type-changed leaf paths."""
    o = _leaf_paths(old)
    n = _leaf_paths(new)
    added = tuple(
        sorted((p, t) for p, t in n.items() if p not in o)
    )
    removed = tuple(
        sorted((p, t) for p, t in o.items() if p not in n)
    )
    changed = tuple(
        sorted(
            (p, o[p], n[p])
            for p in o.keys() & n.keys()
            if o[p] != n[p]
        )
    )
    return SchemaDrift(added=added, removed=removed, changed=changed)
