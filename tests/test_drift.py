"""Invariant tests for the drift / dataset-monitoring family —
properties the DuckDB hash-match can't express: conservation between
related queries, measure bounds, monotonicity, and the loud scale
guards actually firing.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hana_bq_beam_connector_spark.queries import registry
from tests.conftest import SF_DIR


def _q(name):
    return registry()[name].fn


def test_tvd_total_equals_half_band_abs_sum(spark):
    """The guarded exact-integer TVD and the unbounded per-band
    emission describe the same measure: TVD == 0.5 * sum(abs_diff)
    (up to double accumulation of the tiny band frame)."""
    total = _q("drift_tvd_total")(spark, SF_DIR).collect()[0]
    bands = _q("drift_tvd_price_bands")(spark, SF_DIR).collect()
    assert total["n_bands"] == len(bands)
    assert total["n_a"] == sum(r["c_a"] for r in bands)
    assert total["n_b"] == sum(r["c_b"] for r in bands)
    half_sum = 0.5 * sum(r["abs_diff"] for r in bands)
    assert math.isclose(total["tvd"], half_sum, rel_tol=1e-12)
    assert 0.0 <= total["tvd"] <= 1.0


def test_band_proportions_are_distributions(spark):
    bands = _q("drift_tvd_price_bands")(spark, SF_DIR).collect()
    assert math.isclose(sum(r["p_a"] for r in bands), 1.0, rel_tol=1e-12)
    assert math.isclose(sum(r["p_b"] for r in bands), 1.0, rel_tol=1e-12)
    for r in bands:
        assert math.isclose(
            r["abs_diff"], abs(r["p_a"] - r["p_b"]), rel_tol=0
        )


def test_ks_dominates_band_gap_and_bounds(spark):
    """KS is a sup over ECDF gaps: it must be >= the ECDF gap at any
    particular band, and within [0, 1]; the reported row's ks must
    reproduce from its own integer numerator."""
    row = _q("drift_ks_price")(spark, SF_DIR).collect()[0]
    assert 0.0 <= row["ks"] <= 1.0
    assert row["ks_num"] == abs(
        row["cum_a"] * row["n_b"] - row["cum_b"] * row["n_a"]
    )
    assert row["ks"] == row["ks_num"] / (row["n_a"] * row["n_b"])
    # TVD >= KS never holds in general, but KS >= |p_a-p_b| at the
    # coarser 25000-band grid does (coarsening only lowers the sup).
    coarse = _q("drift_tvd_price_bands")(spark, SF_DIR).collect()
    cum_a = cum_b = 0
    n_a = sum(r["c_a"] for r in coarse)
    n_b = sum(r["c_b"] for r in coarse)
    max_gap = 0.0
    for r in sorted(coarse, key=lambda r: r["band"]):
        cum_a += r["c_a"]
        cum_b += r["c_b"]
        max_gap = max(max_gap, abs(cum_a / n_a - cum_b / n_b))
    assert row["ks"] >= max_gap - 1e-12


def test_churn_partitions_distinct_customers(spark, sf_dir):
    from hana_bq_beam_connector_spark.sources.files import load_table

    o = load_table(spark, sf_dir, "orders")
    total = o.select("o_custkey").distinct().count()
    rows = {
        r["status"]: r["n_customers"]
        for r in _q("drift_customer_churn")(spark, sf_dir).collect()
    }
    assert sum(rows.values()) == total
    assert set(rows) <= {"churned", "new", "retained"}


def test_decile_shift_monotone_and_consistent(spark):
    rows = sorted(
        _q("drift_decile_shift_price")(spark, SF_DIR).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 10))
    for prev, cur in zip(rows, rows[1:]):
        assert cur["q_a"] >= prev["q_a"]
        assert cur["q_b"] >= prev["q_b"]
    for r in rows:
        assert r["shift"] == r["q_b"] - r["q_a"]


def test_chi2_terms_nonnegative_and_expected_conserves(spark):
    rows = _q("drift_chi2_priority_homogeneity")(spark, SF_DIR).collect()
    n_a = sum(r["c_a"] for r in rows)
    for r in rows:
        assert r["chi2_term"] >= 0.0
    # Expected A-counts under homogeneity must re-total to n_a.
    assert math.isclose(
        sum(r["expected_a"] for r in rows), n_a, rel_tol=1e-12
    )


@pytest.mark.parametrize("name", ["drift_tvd_total", "drift_ks_price"])
def test_scale_guards_fire_loudly(spark, name, tmp_path):
    """Past the product envelope (n_a*n_b > 2^52 for TVD, whose summed
    numerator reaches 2*n_a*n_b; > 2^53 for KS) the exact-BIGINT
    numerators leave the exact-double range — the queries must raise
    the NAMED error, not wrap and not generic-overflow: the guard is
    the overflow-free ``n_b > bound DIV greatest(n_a, 1)`` form and
    wraps the numerator expression itself, so it evaluates before any
    int64 product in every session mode.  Synthesized by inflating
    the cell counts (2e8 per side -> product 4e16 over both bounds),
    not the data."""
    import hana_bq_beam_connector_spark.queries.drift as drift

    big = spark.createDataFrame(
        [(0, 200_000_000, 200_000_000), (1, 1, 1)],
        "band bigint, c_a bigint, c_b bigint",
    )
    real = drift._price_cells
    drift._price_cells = lambda *a, **k: big
    try:
        with pytest.raises(Exception, match=name):
            _q(name)(spark, SF_DIR).collect()
    finally:
        drift._price_cells = real


def test_user_overlap_bounds_and_totals(spark, sf_dir):
    from hana_bq_beam_connector_spark.queries._util import events_us

    rows = _q("drift_user_overlap")(spark, sf_dir).collect()
    assert rows
    split_us = 1_705_276_800_000_000
    ev = events_us(spark, sf_dir).select("event_type", "user_id", "ts")
    first = (
        ev.filter(F.col("ts") < split_us)
        .select("event_type", "user_id")
        .distinct()
        .count()
    )
    assert sum(r["u_a"] for r in rows) == first
    for r in rows:
        assert 0 <= r["u_both"] <= min(r["u_a"], r["u_b"])
        union = r["u_a"] + r["u_b"] - r["u_both"]
        assert r["jaccard"] == r["u_both"] / union
        assert r["retention"] == r["u_both"] / r["u_a"]
        assert 0.0 <= r["jaccard"] <= 1.0


def test_stream_drift_baseline_shares_conserve(spark, sf_dir):
    rows = _q("stream_drift_baseline")(spark, sf_dir).collect()
    by_window: dict[int, list] = {}
    for r in rows:
        by_window.setdefault(r["window_start"], []).append(r)
    for cells in by_window.values():
        assert sum(c["n"] for c in cells) == cells[0]["win_n"]
        assert math.isclose(
            sum(c["p_window"] for c in cells), 1.0, rel_tol=1e-12
        )
    # The baseline share is window-independent: identical for a type
    # across every window, and the baseline distribution sums to 1.
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], set()).add(r["p_baseline"])
    assert all(len(v) == 1 for v in by_type.values())
    assert math.isclose(
        sum(next(iter(v)) for v in by_type.values()), 1.0, rel_tol=1e-12
    )


@pytest.mark.parametrize("name", ["drift_tvd_total", "drift_ks_price"])
def test_scale_guards_allow_asymmetric_safe_snapshots(spark, name):
    """An asymmetric snapshot pair whose PRODUCT is tiny (n_a=1e10,
    n_b=100 -> n_a*n_b = 1e12, far inside the exact envelope) must
    compute, not false-trip: the division-form guard is exact, unlike
    a per-side cap."""
    import hana_bq_beam_connector_spark.queries.drift as drift

    big = spark.createDataFrame(
        [(0, 9_999_999_999, 99), (1, 1, 1)],
        "band bigint, c_a bigint, c_b bigint",
    )
    real = drift._price_cells
    drift._price_cells = lambda *a, **k: big
    try:
        rows = _q(name)(spark, SF_DIR).collect()
        assert rows and all(r["n_a"] == 10_000_000_000 for r in rows)
    finally:
        drift._price_cells = real
