"""Invariant tests for the geospatial family — properties the DuckDB
hash-match can't express: the grid neighbor join finds EXACTLY the
naive all-pairs result, Morton interleave is a bijection, kNN output
shape/ordering, and the centroid moment guard firing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hana_bq_beam_connector_spark.queries import registry
from hana_bq_beam_connector_spark.queries.geo import (
    _MX,
    _MY,
    _R2,
    _SIDE,
    _morton_sql,
)
from tests.conftest import SF_DIR


def _q(name):
    return registry()[name].fn


def test_grid_neighbor_pairs_equal_naive_all_pairs(spark):
    """The 3x3 grid equi-join must find EXACTLY the pairs a naive
    O(n^2) scan finds — no duplicates (each pair seen once via the
    neighbor's unique cell), no misses (radius == cell size, so a
    within-r neighbor is always within one cell step)."""
    from hana_bq_beam_connector_spark.sources.files import load_table

    keys = [
        r["c_custkey"]
        for r in load_table(spark, SF_DIR, "customer")
        .select("c_custkey")
        .collect()
    ]
    pts = {k: ((k * _MX) % _SIDE, (k * _MY) % _SIDE) for k in keys}
    ks = sorted(pts)
    naive = set()
    for i, a in enumerate(ks):
        ax, ay = pts[a]
        for b in ks[i + 1 :]:
            bx, by = pts[b]
            if (ax - bx) ** 2 + (ay - by) ** 2 <= _R2:
                naive.add((a, b))
    got = {
        (r["key_a"], r["key_b"], r["dist_sq"])
        for r in _q("geo_grid_neighbor_pairs")(spark, SF_DIR).collect()
    }
    assert len(got) == len(naive)
    assert {(a, b) for a, b, _ in got} == naive
    for a, b, d in got:
        ax, ay = pts[a]
        bx, by = pts[b]
        assert d == (ax - bx) ** 2 + (ay - by) ** 2 <= _R2


def _write_customer(spark, path: str, keys: list[int]) -> None:
    spark.createDataFrame(
        [(int(k),) for k in keys], "c_custkey bigint"
    ).selectExpr(
        "c_custkey",
        "CAST(c_custkey % 25 AS BIGINT) AS c_nationkey",
        "'BUILDING' AS c_mktsegment",
        "CAST(c_custkey % 1000 AS DOUBLE) AS c_acctbal",
    ).write.mode("overwrite").parquet(f"{path}/customer.parquet")


def _lod_replay(keys: list[int]) -> set[tuple]:
    """Pure-Python replay of the density-adaptive LoD contract:
    in-envelope points ride through, overdense cells collapse to
    count-weighted integer centroids, then brute-force within-R
    pairs (exact for the grid since radius == cell edge)."""
    from hana_bq_beam_connector_spark.queries.geo import (
        _CELL_CAP,
        _CENTROID_KEY_STRIDE,
        _R,
    )

    by_cell: dict[tuple[int, int], list[tuple[int, int, int]]] = {}
    for k in keys:
        x, y = (k * _MX) % _SIDE, (k * _MY) % _SIDE
        by_cell.setdefault((x // _R, y // _R), []).append((k, x, y))
    pts: dict[int, tuple[int, int, int]] = {}
    for (cx, cy), members in by_cell.items():
        if len(members) > _CELL_CAP:
            n = len(members)
            sx = sum(x for _, x, _ in members)
            sy = sum(y for _, _, y in members)
            key = -(cx * _CENTROID_KEY_STRIDE + cy + 1)
            pts[key] = (sx // n, sy // n, n)
        else:
            for k, x, y in members:
                pts[k] = (x, y, 1)
    ks = sorted(pts)
    want = set()
    for i, a in enumerate(ks):
        ax, ay, aw = pts[a]
        for b in ks[i + 1 :]:
            bx, by, bw = pts[b]
            dsq = (ax - bx) ** 2 + (ay - by) ** 2
            if dsq <= _R2:
                want.add((a, b, dsq, aw, bw))
    return want


def _mixed_density_keys() -> list[int]:
    """2000 spread keys (every cell in-envelope) plus 300 coincident
    duplicates of two base keys whose locations are within R of each
    other but in DIFFERENT cells — so the fixture exercises all three
    pair species: point-point, point-centroid, centroid-centroid."""
    from hana_bq_beam_connector_spark.queries.geo import _R

    base = list(range(1, 2001))
    loc = {k: ((k * _MX) % _SIDE, (k * _MY) % _SIDE) for k in base}
    pick = None
    for a in base:
        ax, ay = loc[a]
        ca = (ax // _R, ay // _R)
        for b in base[a:]:
            bx, by = loc[b]
            if (bx // _R, by // _R) == ca:
                continue
            if (ax - bx) ** 2 + (ay - by) ** 2 <= _R2:
                pick = (a, b)
                break
        if pick:
            break
    assert pick, "no cross-cell within-R base pair found"
    dups = [
        k + _SIDE * t for k in pick for t in range(1, 301)
    ]  # same (x, y) as the base key: k mod _SIDE unchanged
    return base + dups


def test_grid_neighbor_pairs_lod_mixed_density(
    spark, tmp_path_factory
):
    """Mixed-regime equivalence (round-10 LoD path): with two cells
    pushed over the 256-point envelope by coincident duplicates, the
    query must emit exactly the Python-replay pair set — real points
    among themselves, each dense cell as ONE weighted centroid, and
    at least one point-centroid and one centroid-centroid pair."""
    keys = _mixed_density_keys()
    d = str(tmp_path_factory.mktemp("mixed_density"))
    _write_customer(spark, d, keys)
    want = _lod_replay(keys)
    got = {
        tuple(r)
        for r in registry()["geo_grid_neighbor_pairs"]
        .fn(spark, d)
        .collect()
    }
    assert got == want
    kinds = {
        (a < 0) + (b < 0) for a, b, _, _, _ in got
    }  # 0 = pt-pt, 1 = pt-centroid, 2 = centroid-centroid
    assert kinds == {0, 1, 2}
    # centroid weights are the true cell populations
    weights = {a: wa for a, _, _, wa, _ in got if a < 0} | {
        b: wb for _, b, _, _, wb in got if b < 0
    }
    assert weights and all(w > 256 for w in weights.values())


def test_grid_neighbor_pairs_oracle_parity_on_dense_fixture(
    spark, tmp_path_factory
):
    """The registered DuckDB oracle implements the SAME LoD contract:
    the driver's sf0.01 gate never reaches the dense branch, so this
    locks oracle/Spark parity exactly where the adaptive logic
    lives."""
    import duckdb

    from hana_bq_beam_connector_spark.oracle import compare_query

    keys = _mixed_density_keys()
    d = str(tmp_path_factory.mktemp("mixed_density_oracle"))
    _write_customer(spark, d, keys)
    spec = registry()["geo_grid_neighbor_pairs"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{d}/customer.parquet/*.parquet')"
    )
    res = compare_query(
        spark, con, "geo_grid_neighbor_pairs", spec.fn, spec.oracle, d
    )
    assert res.ok, res.mismatches


def test_morton_formula_is_exact_bit_interleave():
    """The engine-portable shift/mask Morton expression equals a
    direct Python bit-interleave for every 8-bit coordinate pair
    sampled across the range (bijectivity follows from exactness)."""
    import duckdb

    con = duckdb.connect()
    cells = [(a, b) for a in (0, 1, 5, 127, 128, 249, 255)
             for b in (0, 2, 63, 200, 255)]
    expr = _morton_sql("cx", "cy", "({v} >> {b})")
    got = dict(
        con.execute(
            "SELECT cx * 1000 + cy, " + expr +
            " FROM (SELECT unnest(?) AS cx, unnest(?) AS cy)",
            [[c[0] for c in cells], [c[1] for c in cells]],
        ).fetchall()
    )

    def interleave(cx: int, cy: int) -> int:
        m = 0
        for b in range(8):
            m |= ((cx >> b) & 1) << (2 * b + 1)
            m |= ((cy >> b) & 1) << (2 * b)
        return m

    for cx, cy in cells:
        assert got[cx * 1000 + cy] == interleave(cx, cy)
    # bijectivity on the sample: all keys distinct
    assert len(set(got.values())) == len(cells)


def test_knn_shape_and_ordering(spark):
    """Every probe gets exactly k=3 neighbors, ranked by ascending
    exact distance with custkey tie-breaks."""
    rows = _q("geo_knn_probe_suppliers")(spark, SF_DIR).collect()
    by_probe: dict[int, list] = {}
    for r in rows:
        by_probe.setdefault(r["s_suppkey"], []).append(r)
    from hana_bq_beam_connector_spark.sources.files import load_table

    n_probes = min(
        load_table(spark, SF_DIR, "supplier").count(), 100
    )  # the probe batch is bounded at 100 on both sides
    assert len(by_probe) == n_probes
    for probe, rs in by_probe.items():
        rs.sort(key=lambda r: r["rn"])
        assert [r["rn"] for r in rs] == [1, 2, 3]
        assert rs[0]["dist_sq"] <= rs[1]["dist_sq"] <= rs[2]["dist_sq"]


def test_centroid_moment_guard_fires(spark):
    """Past the int64 moment envelope the dispersion query raises
    loudly in every session mode instead of wrapping."""
    from pyspark.sql.utils import AnalysisException

    big = spark.range(1).select(
        F.lit("X").alias("n_name"),
        F.lit(900_000_000).cast("bigint").alias("n_points"),
        F.lit(1).cast("bigint").alias("sx"),
        F.lit(1).cast("bigint").alias("sy"),
        F.lit(1).cast("bigint").alias("sxx"),
        F.lit(1).cast("bigint").alias("syy"),
    )
    from hana_bq_beam_connector_spark.queries.geo import _N_MOMENT_GUARD

    guard = (
        f"CASE WHEN n_points > {_N_MOMENT_GUARD} THEN "
        "raise_error('geo_nation_centroid_dispersion: boom') "
        "ELSE CAST(sx AS DOUBLE) / n_points END"
    )
    with pytest.raises(Exception, match="boom"):
        big.select(F.expr(guard).alias("v")).collect()


def test_density_hotspots_deterministic_and_bounded(spark):
    """Top-20 is fully tie-broken (re-running yields identical rows)
    and every cell index is inside the 100x100 grid."""
    a = _q("geo_grid_density_hotspots")(spark, SF_DIR).collect()
    b = _q("geo_grid_density_hotspots")(spark, SF_DIR).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) <= 20
    for r in a:
        assert 0 <= r["cell_x"] < 100 and 0 <= r["cell_y"] < 100
        assert r["n_segments"] <= min(r["n_points"], 5)


def test_knn_probe_batch_bounded_on_both_sides(spark):
    """The registered kNN query must hold its probe batch CONSTANT as
    the corpus scales — on BOTH sides.  (Caught live: the sf0.1 local
    gate flagged a 300-vs-3000 row mismatch after an edit bounded only
    the Spark side; at the sf0.01 gate LIMIT 100 is a no-op because
    there are exactly 100 suppliers, so only the bigger-SF gate can
    see this class.)"""
    spec = registry()["geo_knn_probe_suppliers"]
    assert "LIMIT 100" in spec.oracle
    plan = (
        spec.fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "GlobalLimit 100" in plan, plan
