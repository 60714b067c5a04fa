"""Column-resolution helpers.

Spark's analyzer resolves identifiers case-insensitively (default
``spark.sql.caseSensitive=false``), and uppercase-folding databases —
HANA, the reference's source (HanaToBQ.java:56 relies on it), Derby —
return uppercased names through JDBC.  Any Python-side ``dict``
lookup on ``df.dtypes`` therefore has to resolve the same way or a
``--timestamp-column ts`` config breaks against a ``TS`` column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def resolve_column(df: DataFrame, name: str) -> tuple[str, str]:
    """Return ``(actual_name, dtype)`` for ``name``, matched the way
    Spark matches identifiers (case-insensitively)."""
    for c, t in df.dtypes:
        if c.lower() == name.lower():
            return c, t
    raise KeyError(
        f"column {name!r} not found in {[c for c, _ in df.dtypes]}"
    )
