"""Sketch accuracy at PRODUCTION settings (SURVEY §2c sketches [X]).

The oracle-checked registry queries run the sketches in regimes where
their output is value-deterministic (GK at eps*n < 1 is exact; HLL++
is partition-order independent, pinned as goldens).  These tests cover
the other half of the contract: at realistic 100 TB settings (bounded
accuracy / default rsd) the estimates stay within the published error
bounds of the exact answers.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hana_bq_beam_connector_spark.sources.files import load_table


def test_hll_within_rsd_of_exact(spark, sf_dir):
    """approx_count_distinct at default rsd (0.05): every group's
    estimate within 5 rsd of the exact distinct count (HLL++'s bound
    is ~2 rsd at 97.7%; 5 rsd is a deterministic-data safety margin,
    and the actual testdata error is <3%)."""
    li = load_table(spark, sf_dir, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("est"),
            F.countDistinct("l_partkey").alias("exact"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["est"] - r["exact"]) <= 0.25 * r["exact"], (
            r["l_returnflag"],
            r["est"],
            r["exact"],
        )


def test_hll_partition_order_invariant(spark, sf_dir):
    """The golden-pinning premise of agg_approx_count_distinct:
    HLL++ merge is register-wise max, so the estimate is identical
    under any repartitioning of the input."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_partkey"
    )

    def est(df):
        return {
            (r["l_returnflag"], r["e"])
            for r in df.groupBy("l_returnflag")
            .agg(F.approx_count_distinct("l_partkey").alias("e"))
            .collect()
        }

    assert est(li) == est(li.repartition(7)) == est(li.repartition(64))


def test_gk_percentile_within_rank_error(spark, sf_dir):
    """percentile_approx at a production accuracy (100): the returned
    value's true rank is within eps*n = n/100 of the target rank —
    the GK guarantee, checked against the exact sorted order."""
    li = load_table(spark, sf_dir, "lineitem")
    n = li.count()
    est = li.agg(
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(100)).alias(
            "m"
        )
    ).first()["m"]
    rank = li.where(F.col("l_extendedprice") <= est).count()
    assert abs(rank - 0.5 * n) <= n / 100 + 1, (est, rank, n)


def test_gk_exact_regime_matches_exact_median(spark, sf_dir):
    """The exact-regime premise of agg_approx_percentiles: with
    eps*n < 1 the sketch output IS the discrete quantile, equal to
    the exact median element."""
    li = load_table(spark, sf_dir, "lineitem")
    est = li.agg(
        F.percentile_approx(
            "l_extendedprice", F.lit(0.5), F.lit(100_000_000)
        ).alias("m")
    ).first()["m"]
    n = li.count()
    # discrete median: element at rank ceil(n/2) in ascending order
    exact = (
        li.select("l_extendedprice")
        .orderBy("l_extendedprice")
        .limit((n + 1) // 2)
        .orderBy(F.col("l_extendedprice").desc())
        .first()["l_extendedprice"]
    )
    assert est == exact
