"""Invariant tests for the round-4 families (privacy, entity
resolution, interval union, attribution, model scoring) — properties
the DuckDB hash-match can't express: monotonicity, conservation,
consistency between related queries.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hana_bq_beam_connector_spark.queries import registry
from tests.conftest import SF_DIR


def _q(name):
    return registry()[name].fn


def test_generalization_ladder_monotone(spark):
    """Coarsening the QI can only merge groups: as gid walks up the
    ladder, the worst (minimum) group size and the k-anonymous row
    share must be non-decreasing, and the group count non-increasing."""
    rows = sorted(
        _q("privacy_generalization_ladder")(spark, SF_DIR).collect(),
        key=lambda r: r["gid"],
    )
    assert [r["gid"] for r in rows] == [0, 1, 3, 7]
    for prev, cur in zip(rows, rows[1:]):
        assert cur["min_group_size"] >= prev["min_group_size"]
        assert cur["safe_share"] >= prev["safe_share"]
        assert cur["n_groups"] <= prev["n_groups"]
    # Fully generalized: one group holding every row, trivially safe.
    top = rows[-1]
    assert top["n_groups"] == 1 and top["safe_share"] == 1.0


def test_k_anonymity_audit_consistent_with_ladder(spark):
    """The audit's violating groups must account exactly for the
    ladder's unsafe rows at the finest level."""
    audit = _q("privacy_k_anonymity_audit")(spark, SF_DIR)
    unsafe_rows = audit.agg(F.sum("n_rows")).collect()[0][0] or 0
    finest = (
        _q("privacy_generalization_ladder")(spark, SF_DIR)
        .where(F.col("gid") == 0)
        .collect()[0]
    )
    total = (
        spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    )
    assert finest["safe_rows"] + unsafe_rows == total


def test_er_clusters_cover_all_pair_members(spark):
    """Every id appearing in a fuzzy pair lands in exactly one entity,
    and entity sizes sum to the member universe."""
    pairs = _q("er_blocked_pairs")(spark, SF_DIR)
    members = (
        pairs.select(F.col("id_a").alias("k"))
        .union(pairs.select(F.col("id_b").alias("k")))
        .distinct()
    )
    ents = _q("er_entity_clusters")(spark, SF_DIR)
    n_members = ents.agg(F.sum("n_members")).collect()[0][0]
    assert n_members == members.count()
    # Canonical key is the component minimum, so no member id can be
    # smaller than its entity id: entity ids are members themselves.
    assert ents.join(
        members, ents.entity_id == members.k, "left_anti"
    ).count() == 0


def test_interval_union_coverage_bounds(spark):
    """Per-user coverage is sandwiched: at least one interval's width
    (5 min), at most n_events * width; and islands can't outnumber
    events."""
    cov = _q("ts_interval_union_coverage")(spark, SF_DIR)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    per_user = ev.groupBy("user_id").agg(F.count("*").alias("n_ev"))
    j = cov.join(per_user, "user_id")
    bad = j.where(
        (F.col("covered_us") < 300_000_000)
        | (F.col("covered_us") > F.col("n_ev") * 300_000_000)
        | (F.col("n_islands") > F.col("n_ev"))
        | (F.col("n_islands") < 1)
    )
    assert bad.count() == 0
    assert cov.count() == per_user.count()  # every user reports


def test_attribution_credit_conservation(spark):
    """Summed over event types, attributed credit equals one million
    ppm per closed segment minus only the documented floor-division
    remainder (< n_touch per segment)."""
    total = (
        _q("ts_position_attribution")(spark, SF_DIR)
        .agg(
            F.sum("credit_ppm_total").alias("credit"),
            F.sum("n_touches").alias("touches"),
        )
        .collect()[0]
    )
    # Rebuild segment count independently: purchases with at least one
    # preceding non-purchase touch since the prior purchase.
    from pyspark.sql.window import Window

    from hana_bq_beam_connector_spark.queries._util import events_us

    evu = events_us(spark, SF_DIR).select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    seg = evu.withColumn(
        "seg_id",
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).over(w),
    )
    touched_segments = (
        seg.where(
            (F.col("seg_id") >= 1) & (F.col("event_type") != "purchase")
        )
        .select("user_id", "seg_id")
        .distinct()
        .count()
    )
    exact = touched_segments * 1_000_000
    assert total["credit"] <= exact
    # Remainder loss happens only in >=3-touch segments and is < n-2
    # ppm-units per such segment — far below one unit per touch.
    assert exact - total["credit"] < total["touches"]


def test_model_score_by_source_aggregates_scores(spark):
    """The calibration report must be the exact rollup of the per-doc
    scores."""
    per_doc = _q("curation_model_score")(spark, SF_DIR)
    by_source = _q("curation_model_score_by_source")(spark, SF_DIR)
    n_accept = per_doc.where("accept").count()
    assert (
        by_source.agg(F.sum("n_accept")).collect()[0][0] == n_accept
    )
    assert (
        by_source.agg(F.sum("n_docs")).collect()[0][0]
        == per_doc.count()
    )


def test_lsh_recall_report_sane(spark):
    """Hits can't exceed either side, and recall matches the counts."""
    r = _q("dedup_lsh_recall_report")(spark, SF_DIR).collect()[0]
    assert r["n_hit"] <= r["n_truth"] and r["n_hit"] <= r["n_lsh"]
    if r["n_truth"] > 0:
        assert r["recall"] == r["n_hit"] / r["n_truth"]
    else:
        assert r["recall"] is None
