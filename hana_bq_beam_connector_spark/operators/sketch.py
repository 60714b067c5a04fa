"""Mergeable sketch operators beyond Spark's built-ins.

Spark ships HLL (approx_count_distinct) and GK quantiles
(approx_percentile); the classic third sketch — Count-Min for
per-key frequency estimation — has no built-in.  This one is built
from the same cross-engine affine-hash toolbox as MinHash
(functions/hashing.py), so a DuckDB oracle reproduces it bit-exactly.

Scale story (the reason a 100 TB pipeline wants it): estimating
per-key frequencies with a groupBy shuffles the full key space —
O(distinct keys) rows through the exchange.  The CMS table is a fixed
``d × w`` counter grid; partial aggregation collapses every map task's
contribution to at most ``d·w`` cells before the shuffle, so exchange
volume is bounded by ``d·w·partitions`` regardless of input size or
key cardinality, and the final table (KBs) broadcasts to whoever
probes it.  Estimates only ever over-count (collisions add), never
under-count — the standard CMS guarantee, asserted in
tests/test_properties.py.

The reference implements nothing comparable (SURVEY §2b: no
aggregation at all); this is [X] surface per BASELINE.json's
north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hana_bq_beam_connector_spark.functions.hashing import PRIME
from hana_bq_beam_connector_spark.operators._common import explode_nonempty

# Affine row hashes h_r(x) = ((a*x + b) mod PRIME) mod w — fixed
# constants shared with the DuckDB oracle spelling below.
CMS_COEFFS: list[tuple[int, int]] = [
    (293847593, 847562931),
    (758392047, 192837465),
    (584930275, 657483920),
    (417283946, 920384756),
]


def _cell(key_expr: str, a: int, b: int, w: int) -> str:
    """BIGINT column index of ``key_expr`` in row (a, b): all-integer
    arithmetic, identical in Spark SQL and DuckDB."""
    return f"((({a} * ({key_expr})) + {b}) % {PRIME}) % {w}"


def count_min_sketch(
    df: DataFrame, key_expr: str, w: int = 1024, d: int = 4
) -> DataFrame:
    """Build a d×w Count-Min sketch of ``key_expr`` occurrences.

    Returns (r, c, cnt): one row per touched cell.  Single scan; each
    input row fans out to ``d`` cells map-side (constant-size struct
    array, no lambda), and partial agg bounds the shuffle at d·w rows
    per map task.
    """
    if d > len(CMS_COEFFS):
        raise ValueError(f"d <= {len(CMS_COEFFS)} supported")
    entries = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                F.expr(_cell(key_expr, a, b, w)).alias("c"),
            )
            for r, (a, b) in enumerate(CMS_COEFFS[:d])
        ]
    )
    return (
        df.select(explode_nonempty(entries).alias("e"))
        .groupBy(F.col("e.r").alias("r"), F.col("e.c").alias("c"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, key_col: str, w: int = 1024,
    d: int = 4,
) -> DataFrame:
    """Estimated frequency of each probe key: min over the d row
    counters the key hashes to.  The sketch (≤ d·w rows) broadcasts;
    probing never shuffles the probe side."""
    cells = probes.select(
        F.col(key_col),
        explode_nonempty(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        F.expr(_cell(key_col, a, b, w)).alias("c"),
                    )
                    for r, (a, b) in enumerate(CMS_COEFFS[:d])
                ]
            )
        ).alias("e"),
    ).select(key_col, F.col("e.r").alias("r"), F.col("e.c").alias("c"))
    return (
        cells.join(F.broadcast(sketch), ["r", "c"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )


def duck_cms_sql(
    source_sql: str, key: str, w: int = 1024, d: int = 4
) -> str:
    """DuckDB CTE body reproducing count_min_sketch(source, key):
    ``SELECT r, c, cnt`` with identical integer arithmetic."""
    arms = " UNION ALL ".join(
        f"SELECT {r} AS r, {_cell(key, a, b, w)} AS c FROM ({source_sql})"
        for r, (a, b) in enumerate(CMS_COEFFS[:d])
    )
    return f"SELECT r, c, COUNT(*) AS cnt FROM ({arms}) GROUP BY r, c"


def bitmap_distinct(
    df: DataFrame, group_cols: list[str], id_expr: str, out: str = "n_distinct"
) -> DataFrame:
    """EXACT count-distinct per group via a two-level bitmap aggregate
    (the ClickHouse/Doris "bitmap index" pattern).

    Level 1 groups by (group, ``id div 64``) and ORs each id's bit
    into a 64-bit word; level 2 sums ``bit_count(word)``.  Both
    levels partial-aggregate map-side, so the exchange carries at most
    one word per (group, id-bucket) per map task — for dense id
    spaces that is a 64× cut over count_distinct's expand, and the
    level-1 word table is itself a mergeable exact-distinct index
    (persist it bucketed and tomorrow's increment ORs into it without
    rescanning history).

    Exact for any non-negative BIGINT id; no sketch error.  All
    codegen'd integer ops (shiftleft / bit_or / bit_count).
    """
    words = (
        df.withColumn("__bkt", F.expr(f"({id_expr}) div 64"))
        .withColumn(
            "__bit", F.expr(f"shiftleft(cast(1 as bigint), pmod({id_expr}, 64))")
        )
        .groupBy(*group_cols, "__bkt")
        .agg(F.expr("bit_or(__bit)").alias("__word"))
    )
    return (
        words.groupBy(*group_cols)
        .agg(F.expr("sum(bit_count(__word))").alias(out))
    )
