"""Bucketed co-located joins skip the shuffle (scale-critical)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hana_bq_beam_connector_spark.sinks_bucketed import (
    read_table,
    write_bucketed,
)
from hana_bq_beam_connector_spark.sources.files import load_table

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark):
    o = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    write_bucketed(o, "orders_b", ["o_orderkey"], n_buckets=8)
    write_bucketed(li, "lineitem_b", ["l_orderkey"], n_buckets=8)

    ob, lb = read_table(spark, "orders_b"), read_table(spark, "lineitem_b")
    joined = lb.join(
        ob.hint("merge"), lb["l_orderkey"] == ob["o_orderkey"]
    ).select("o_orderkey", "l_linenumber", "o_totalprice")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located bucketed sides: the sort-merge join reads buckets
    # directly — no Exchange (shuffle) anywhere in the plan
    assert "Exchange" not in plan, plan
    # and the result is still correct
    want = li.join(o, li["l_orderkey"] == o["o_orderkey"]).count()
    assert joined.count() == want


def test_bucketed_agg_has_no_exchange(spark):
    li = load_table(spark, SF, "lineitem")
    write_bucketed(li, "lineitem_b2", ["l_orderkey"], n_buckets=8)
    agg = (
        read_table(spark, "lineitem_b2")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert agg.count() == li.select("l_orderkey").distinct().count()
