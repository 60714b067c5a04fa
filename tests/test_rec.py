"""Invariant tests for the recommendation family — cross-query
conservation and measure bounds the DuckDB hash-match can't express.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hana_bq_beam_connector_spark.queries import registry
from tests.conftest import SF_DIR


def _q(name):
    return registry()[name].fn


def test_jaccard_and_confidence_bounds(spark):
    nb = _q("rec_item_jaccard_neighbors")(spark, SF_DIR).collect()
    assert nb
    for r in nb:
        assert 0 < r["jaccard"] <= 1.0
        assert r["n_ab"] <= min(r["n_anchor"], r["n_neighbor"])
        assert 1 <= r["rnk"] <= 3
    conf = _q("rec_also_bought_confidence")(spark, SF_DIR).collect()
    assert len({r["anchor"] for r in conf}) <= 10
    for r in conf:
        assert 0 < r["confidence"] <= 1.0
        assert r["n_ab"] <= r["n_anchor"]


def test_lift_matches_support_replay(spark):
    """Each reported lift must equal the one-division IEEE replay of
    its exact integer operands."""
    from hana_bq_beam_connector_spark.sources.files import load_table

    n = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey")
        .distinct()
        .count()
    )
    rows = _q("rec_item_lift_topk")(spark, SF_DIR).collect()
    assert rows and [r["rnk"] for r in rows] == list(
        range(1, len(rows) + 1)
    )
    for r in rows:
        assert r["lift"] == (r["n_ab"] * n) / (r["n_a"] * r["n_b"])
        assert r["n_ab"] >= 3


def test_user_candidates_are_novel_and_ranked(spark):
    """No recommended item may already be owned by the customer, and
    per-user ranks are 1..k by (evidence, weight, key)."""
    from hana_bq_beam_connector_spark.sources.files import load_table

    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    owned = {
        (r["o_custkey"], r["item"])
        for r in o.join(li, li["l_orderkey"] == o["o_orderkey"])
        .select("o_custkey", F.col("l_partkey").alias("item"))
        .distinct()
        .collect()
    }
    rows = _q("rec_user_candidates")(spark, SF_DIR).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        assert (r["o_custkey"], r["item"]) not in owned
        by_user.setdefault(r["o_custkey"], []).append(r)
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
        keys = [
            (-r["n_evidence"], -r["evidence_weight"], r["item"])
            for r in rs
        ]
        assert keys == sorted(keys)


def test_coverage_audit_conserves_slots_and_catalog(spark):
    """Decile rows partition the catalog; total slots equal the
    neighbor-list row count; coverage stays in [0, 1]."""
    from hana_bq_beam_connector_spark.sources.files import load_table

    n_items = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_partkey")
        .distinct()
        .count()
    )
    nb_rows = _q("rec_item_jaccard_neighbors")(spark, SF_DIR).count()
    audit = _q("rec_coverage_popularity_bias")(spark, SF_DIR).collect()
    assert sorted(r["pop_decile"] for r in audit) == list(range(1, 11))
    assert sum(r["n_catalog_items"] for r in audit) == n_items
    assert sum(r["n_slots"] for r in audit) == nb_rows
    for r in audit:
        assert 0.0 <= r["coverage"] <= 1.0
        assert r["n_recommended_items"] <= r["n_catalog_items"]


def test_lift_guard_fires_past_basket_envelope(spark):
    from hana_bq_beam_connector_spark.queries.rec import _N_BASKET_GUARD

    big = spark.range(1).select(
        F.lit(_N_BASKET_GUARD + 1).cast("bigint").alias("n"),
        F.lit(5).cast("bigint").alias("n_ab"),
    )
    expr = (
        f"CASE WHEN n > {_N_BASKET_GUARD} THEN "
        "raise_error('rec boom') ELSE CAST(n_ab * n AS DOUBLE) END"
    )
    with pytest.raises(Exception, match="rec boom"):
        big.select(F.expr(expr).alias("v")).collect()
