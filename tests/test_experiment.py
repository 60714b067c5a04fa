"""Invariant tests for the experimentation family — Python replays of
the closing statistics from the exact integer operands, assignment
reproducibility, and cross-query conservation.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hana_bq_beam_connector_spark.queries import registry
from hana_bq_beam_connector_spark.queries.experiment import _KNUTH
from tests.conftest import SF_DIR


def _q(name):
    return registry()[name].fn


def _arm(uid: int) -> str:
    return "treatment" if (uid * _KNUTH) % 100 < 50 else "control"


def test_srm_check_matches_python_replay(spark):
    from hana_bq_beam_connector_spark.sources.files import load_table

    users = [
        r["user_id"]
        for r in load_table(spark, SF_DIR, "events")
        .select("user_id")
        .distinct()
        .collect()
    ]
    want = {"treatment": 0, "control": 0}
    for u in users:
        want[_arm(u)] += 1
    rows = {r["arm"]: r for r in _q("exp_assignment_srm_check")(spark, SF_DIR).collect()}
    assert set(rows) == {"treatment", "control"}
    total = len(users)
    for arm, r in rows.items():
        assert r["n_users"] == want[arm]
        assert r["n_total"] == total
        assert r["expected"] == total / 2
        d = r["n_users"] - total / 2
        assert r["srm_chi2_term"] == d * d / (total / 2)


def test_conversion_z_matches_python_replay(spark):
    [r] = _q("exp_conversion_lift_z")(spark, SF_DIR).collect()
    assert r["n_t"] > 0 and r["n_c"] > 0
    assert 0 < r["conv_t"] < r["n_t"] or 0 < r["conv_c"] < r["n_c"]
    rate_t = r["conv_t"] / r["n_t"]
    rate_c = r["conv_c"] / r["n_c"]
    assert r["rate_t"] == rate_t and r["rate_c"] == rate_c
    assert r["lift"] == rate_t - rate_c
    p = (r["conv_t"] + r["conv_c"]) / (r["n_t"] + r["n_c"])
    se = math.sqrt(p * (1 - p) * (1 / r["n_t"] + 1 / r["n_c"]))
    assert r["z_stat"] == (rate_t - rate_c) / se


def test_cuped_identity_holds_exactly(spark):
    """cuped_lift must equal raw_lift − theta·pre_diff as the SAME
    IEEE expression — and conservation: n = n_t + n_c."""
    [r] = _q("exp_cuped_adjusted_lift")(spark, SF_DIR).collect()
    assert r["n"] == r["n_t"] + r["n_c"]
    assert math.isfinite(r["theta"])
    assert r["cuped_lift"] == r["raw_lift"] - r["theta"] * r["pre_diff"]


def test_engagement_conserves_users_and_bounds(spark):
    from hana_bq_beam_connector_spark.sources.files import load_table

    n_users = (
        load_table(spark, SF_DIR, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    n_events = load_table(spark, SF_DIR, "events").count()
    rows = _q("exp_engagement_by_arm")(spark, SF_DIR).collect()
    assert sum(r["n_users"] for r in rows) == n_users
    assert sum(r["total_events"] for r in rows) == n_events
    for r in rows:
        assert r["events_per_user"] >= 1.0
        assert r["active_days_per_user"] >= 1.0
        assert 0 <= r["n_full_funnel_users"] <= r["n_users"]


def test_assignment_is_sf_stable(spark):
    """A user keeps their arm across scale factors (the hash depends
    only on user_id) — re-randomizing between data refreshes would
    invalidate a running experiment."""
    for uid in (1, 2, 7, 149, 1500, 123456789):
        a1 = _arm(uid)
        a2 = _arm(uid)
        assert a1 == a2
    # and the split is roughly balanced over a key range
    n_t = sum(1 for u in range(1, 10001) if _arm(u) == "treatment")
    assert 4500 < n_t < 5500


def test_halfsample_replicas_match_python_membership(spark):
    """Replica membership and means must replay exactly from the md5
    coin in Python (no RNG anywhere), and memberships must look
    binomial, not Weyl-regular."""
    import hashlib
    from decimal import Decimal

    from hana_bq_beam_connector_spark.queries import registry
    from hana_bq_beam_connector_spark.queries.stats import _BOOT_B
    from hana_bq_beam_connector_spark.sources.files import load_table
    from tests.conftest import SF_DIR

    orders = (
        load_table(spark, SF_DIR, "orders")
        .select("o_orderkey", "o_totalprice")
        .collect()
    )
    want: dict[int, list] = {b: [] for b in range(_BOOT_B)}
    for r in orders:
        for b in range(_BOOT_B):
            digest = hashlib.md5(
                f"{r['o_orderkey']}:{b}".encode()
            ).hexdigest()
            if int(digest[:2], 16) < 128:
                want[b].append(r["o_totalprice"])
    got = {
        r["replica"]: r
        for r in registry()["stat_halfsample_replica_means"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert set(got) == {b for b in range(_BOOT_B) if want[b]}
    for b, r in got.items():
        vals = want[b]
        assert r["n_orders"] == len(vals)
        total = sum(
            Decimal(str(v)).quantize(Decimal("0.01")) for v in vals
        )
        assert r["mean_price"] == float(total) / len(vals)
        assert 0.35 < len(vals) / len(orders) < 0.65
    # binomial spread, not the phase-shifted-Weyl collapse: replica
    # sizes must not all be identical
    assert len({r["n_orders"] for r in got.values()}) > 1
