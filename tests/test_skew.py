"""Skew story, proven on actually-skewed data (round-4 verdict #5).

``salted_join`` and AQE's skew-join split were equivalence-tested but
never raced against a genuinely hot key.  Here one key holds 75% of
an 8M-row fact table:

* with AQE on (and test-scale thresholds), the final adaptive plan of
  a sort-merge join must carry ``skew=true`` — the runtime re-split
  actually fires;
* with AQE off (pre-3.0 clusters, or skew inside a single key that
  AQE cannot split), ``salted_join`` must beat the unsalted sort-merge
  join wall-clock, because the hot key's sort spreads over ``salt``
  tasks instead of one straggler.

Broadcast is disabled throughout: a broadcast of the dim side would
erase the shuffle whose skew is under test.  Numbers land in SCALE.md
(equi-join row).
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from hana_bq_beam_connector_spark.operators.relational import salted_join

N_ROWS = 8_000_000
N_COLD_KEYS = 10_000


def _skewed_fact(spark):
    """75% of rows on key 0, the rest uniform over N_COLD_KEYS.

    ``v`` is a bounded pseudo-random payload that must survive into
    the aggregate: with only the constant hot key in the shuffle,
    lz4 squashes the hot partition below any skew threshold and the
    AQE split (correctly) sees nothing to split.  Bounded to 1e9 so
    a 4M-row ANSI sum stays far from long overflow."""
    return spark.range(N_ROWS).select(
        F.when(F.col("id") % 4 != 3, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_COLD_KEYS)) + 1)
        .cast("long")
        .alias("k"),
        F.pmod(F.xxhash64("id"), F.lit(1_000_000_000)).alias("v"),
    )


def _dim(spark):
    return spark.range(N_COLD_KEYS + 1).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("w")
    )


@pytest.fixture()
def _no_broadcast(spark):
    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.enabled",
        )
    }
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    yield spark
    for k, v in saved.items():
        if v is None:
            conf.unset(k)
        else:
            conf.set(k, v)


def test_aqe_skew_split_activates(_no_broadcast):
    """The final adaptive plan of the hot-key sort-merge join must
    mark the join ``skew=true`` once thresholds match the test scale
    (defaults target 256MB partitions; the hot partition here is
    ~tens of MB)."""
    spark = _no_broadcast
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "1MB",
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB"
    )
    joined = _skewed_fact(spark).join(_dim(spark), "k").groupBy().agg(
        F.sum("w").alias("s"),
        F.sum("v").alias("sv"),  # keeps v in the shuffled row
        F.count(F.lit(1)).alias("n"),
    )
    [row] = joined.collect()
    assert row["n"] == N_ROWS
    final_plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in final_plan, (
        "AQE skew-join split did not activate on a 75%-hot key:\n"
        + final_plan[:2000]
    )


def test_salted_beats_unsalted_on_hot_key(_no_broadcast):
    """AQE off: one task sorts the 6M-row hot key in the unsalted
    sort-merge join; salting spreads it 16 ways.  The race asserts a
    real wall-clock win (≥1.15×), far below the typical ~2-3× margin,
    to stay robust to CI noise."""
    spark = _no_broadcast
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # Materialize the inputs: the race must time the JOIN, not the
    # row generation both paths pay identically (which at 8 cores
    # dominates and dilutes the straggler to statistical noise).
    import tempfile

    tmp = tempfile.mkdtemp(prefix="skewrace_")
    _skewed_fact(spark).write.mode("overwrite").parquet(f"{tmp}/fact")
    _dim(spark).write.mode("overwrite").parquet(f"{tmp}/dim")
    fact = spark.read.parquet(f"{tmp}/fact")
    dim = spark.read.parquet(f"{tmp}/dim")

    def _run(df):
        t0 = time.monotonic()
        [row] = df.groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("w").alias("s"),
            F.sum("v").alias("sv"),  # keep the payload in the shuffle
        ).collect()
        return time.monotonic() - t0, row

    # Warm both paths once (JIT, codegen caches) at 1/40 scale.
    small_f = fact.limit(100_000)
    _run(small_f.join(dim, "k"))
    _run(salted_join(small_f, dim, on="k", salt=16))

    # Median-of-3 per variant, runs interleaved: a single GC pause or
    # cold file handle can't dominate the margin, and (unlike the
    # previous best-of-two + best-of-two retry) the estimator is not
    # biased toward passing — a genuine regression of the salted path
    # must shift the MAJORITY of its runs, not just lose every single
    # timing (round-5 advisor finding).  Every sample is printed so a
    # shrinking win stays visible in the test log.
    from statistics import median

    plain_ts, salted_ts = [], []
    r_plain = r_salted = None
    for _ in range(3):
        t, r_plain = _run(fact.join(dim, "k"))
        plain_ts.append(t)
        t, r_salted = _run(salted_join(fact, dim, on="k", salt=16))
        salted_ts.append(t)
    t_plain, t_salted = median(plain_ts), median(salted_ts)

    # Same answer...
    assert (r_plain["n"], r_plain["s"]) == (r_salted["n"], r_salted["s"])
    assert r_plain["n"] == N_ROWS
    # ...measurably faster. Print for SCALE.md's equi-join row.
    print(
        f"\nskew race ({N_ROWS} rows, 75% hot key, AQE off, no broadcast): "
        f"unsalted={[round(t, 2) for t in plain_ts]} "
        f"salted(16)={[round(t, 2) for t in salted_ts]} "
        f"median speedup={t_plain / t_salted:.2f}x"
    )
    if not t_salted * 1.15 < t_plain:
        # A concurrent process stealing cores mid-race can flatten the
        # margin (the straggler task and the salted tasks then queue
        # behind the SAME contention) — observed once in a full-suite
        # run with a second Spark driver alive.  One clean redo of
        # the whole race (still median-of-3, no cherry-picking)
        # before declaring the optimization dead.
        plain_ts = [_run(fact.join(dim, "k"))[0] for _ in range(3)]
        salted_ts = [
            _run(salted_join(fact, dim, on="k", salt=16))[0]
            for _ in range(3)
        ]
        t_plain, t_salted = median(plain_ts), median(salted_ts)
        print(
            f"skew race retry: unsalted={[round(t, 2) for t in plain_ts]} "
            f"salted(16)={[round(t, 2) for t in salted_ts]}"
        )
    assert t_salted * 1.15 < t_plain, (
        f"salted_join (median {t_salted:.2f}s of {salted_ts}) did not "
        f"beat unsalted (median {t_plain:.2f}s of {plain_ts}) on a "
        "75%-hot key"
    )
