"""Invariant tests for the round-8 batch.

Round 8 de-transcendentalizes the auto-plane count (verdict-r7 ask #2 /
ADVICE): ``max(4, ceil(log2(max(2, n/target))))`` is replaced by the
pure-integer ``max(4, bit_length(max(2, ceil_div(n, target)) - 1))`` in
BOTH engines.  These tests prove (a) the integer formulation equals the
real-math ceil-log2 at every n, including exact power-of-two
boundaries where a 1-ULP libm disagreement could have flipped the
plane count, and (b) the DuckDB shift-fold in the oracle CTE computes
the identical value for the same corpus sizes.
"""

from __future__ import annotations

import duckdb
import pytest


def _int_planes(n: int, target: int = 64) -> int:
    """The shipped formulation (operators/dedup.py auto branch)."""
    q = max(2, -(-n // target))
    return max(4, (q - 1).bit_length())


def _real_math_planes(n: int, target: int = 64) -> int:
    """Exact real-arithmetic reference: smallest k with
    2**k >= max(2, n/target), floored at 4 — computed with integer
    comparisons only (2**k * target >= n avoids any float)."""
    k = 1  # max(2, ..) means k starts where 2**k >= 2
    while (1 << k) * target < n:
        k += 1
    return max(4, k)


# Exact power-of-two boundaries (n = target * 2**k) are THE cases a
# transcendental formulation could flip; straddle each by +/-1.
_BOUNDARY_NS = sorted(
    {
        n
        for k in range(0, 24)
        for n in (64 * (1 << k) - 1, 64 * (1 << k), 64 * (1 << k) + 1)
    }
    | {1, 2, 63, 65, 100, 5000, 50_000, 60_000, 600_000, 6_000_000}
)


@pytest.mark.parametrize("n", _BOUNDARY_NS)
def test_auto_planes_integer_equals_real_math(n):
    assert _int_planes(n) == _real_math_planes(n), n


def test_auto_planes_monotone_and_floored():
    prev = 0
    for n in _BOUNDARY_NS:
        cur = _int_planes(n)
        assert cur >= 4
        assert cur >= prev  # more data never means fewer planes
        prev = cur


@pytest.mark.parametrize(
    "n", [1, 63, 64, 65, 127, 128, 129, 4095, 4096, 4097, 50_000, 65_536]
)
def test_duckdb_pa_cte_matches_python(n):
    """The oracle's pa CTE (shift-fold bit_length over integer
    ceil-div) must yield the same plane count Python chooses for the
    same corpus size — exercised standalone on a synthetic n-row
    table, including exact power-of-two boundary corpus sizes."""
    target = 64
    sql = f"""
    WITH q AS (
      SELECT GREATEST(CAST(2 AS BIGINT),
               (COUNT(*) + {target - 1}) // {target}) AS qv
      FROM range({n})
    )
    SELECT CAST(GREATEST(CAST(4 AS BIGINT),
      list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(range(0, 63), p ->
          CASE WHEN ((qv - 1) >> p) > 0
               THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
        (acc, v) -> acc + v)) AS INTEGER) AS np
    FROM q
    """
    (np_sql,) = duckdb.sql(sql).fetchone()
    assert np_sql == _int_planes(n, target), n


def test_recall_k_divisor_integer_ceil_div():
    """K = max(10, ceil_div(n, 5000)) — integer in both engines; the
    Python and DuckDB expressions agree around the 5000 multiples."""
    for n in (1, 4999, 5000, 5001, 49_999, 50_000, 50_001, 10**6):
        py = max(10, -(-n // 5000))
        (sql,) = duckdb.sql(
            f"SELECT GREATEST(CAST(10 AS BIGINT), "
            f"(COUNT(*) + 4999) // 5000) FROM range({n})"
        ).fetchone()
        assert sql == py, n
