"""Dynamic partition pruning over a hive-partitioned layout.

Static partition pruning (a literal filter on the partition column →
`PartitionFilters`) is asserted in test_sources.py / test_llm_data_ops.
This covers the RUNTIME variant: when a partitioned fact joins a dim
whose selective filter is only known at execution time, Spark injects
a `dynamicpruningexpression(part_col IN dynamicpruning#N)` into the
fact scan's PartitionFilters — the fact side reads ONLY the partition
directories the filtered dim actually references.  At 100 TB that is
the difference between scanning five event-type directories and one.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from hana_bq_beam_connector_spark.sinks import overwrite_partitions


def test_dynamic_partition_pruning_fires_and_matches(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    fact_path = str(tmp_path / "fact")
    dim_path = str(tmp_path / "dim")
    overwrite_partitions(
        ev.select("event_id", "user_id", "value", "event_type"),
        fact_path,
        ["event_type"],
    )
    spark.createDataFrame(
        [(t, float(i)) for i, t in enumerate(
            ["click", "signup", "error", "view", "purchase"]
        )],
        ["event_type", "weight"],
    ).write.mode("overwrite").parquet(dim_path)

    fact = spark.read.parquet(fact_path)
    # Selective predicate on the dim — its surviving keys are only
    # known at runtime, so any partition pruning must be dynamic.
    dim = spark.read.parquet(dim_path).where(F.col("weight") < 1.5)
    joined = (
        fact.join(dim, "event_type")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf is not None and "dynamicpruning" in pf.group(1).lower(), plan

    # Pruning must not change the answer: same counts as the plain
    # (unpartitioned) join.
    expected = {
        (r["event_type"], r["n"])
        for r in ev.join(dim, "event_type")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {(r["event_type"], r["n"]) for r in joined.collect()}
    assert got == expected and len(got) == 2
