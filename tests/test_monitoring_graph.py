"""Invariant tests for ts_cusum_changepoint and
graph_clustering_coefficient — cross-query conservation laws the
DuckDB hash-match can't express.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hana_bq_beam_connector_spark.queries import registry
from tests.conftest import SF_DIR


def _q(name):
    return registry()[name].fn


def test_cusum_interior_and_reproducible(spark):
    """The reported break is interior, its statistic reproduces from
    the raw hourly series, and it IS the argmax of that series."""
    from hana_bq_beam_connector_spark.queries._util import events_us

    rows = _q("ts_cusum_changepoint")(spark, SF_DIR).collect()
    assert rows, "no change points"
    hour_us = 3_600_000_000
    ev = events_us(spark, SF_DIR).select("event_type", "ts")
    hourly = (
        ev.groupBy(
            "event_type",
            (F.col("ts") - F.col("ts") % hour_us).alias("hour_us"),
        )
        .count()
        .collect()
    )
    by_type: dict[str, list] = {}
    for r in hourly:
        by_type.setdefault(r["event_type"], []).append(
            (r["hour_us"], r["count"])
        )
    for row in rows:
        series = sorted(by_type[row["event_type"]])
        n = len(series)
        total = sum(c for _, c in series)
        assert 1 <= row["k"] <= n - 1
        assert row["n_hours"] == n and row["total"] == total
        # Recompute every interior CUSUM numerator; the reported row
        # must be the (abs-max, earliest-hour) winner exactly.
        cum = 0
        best = None
        for k, (hour, c) in enumerate(series[: n - 1], start=1):
            cum += c
            num = n * cum - k * total
            key = (-abs(num), hour)
            if best is None or key < best[0]:
                best = (key, hour, k, num, cum)
        _, hour, k, num, cum = best
        assert (row["change_hour_us"], row["k"], row["cusum_num"]) == (
            hour,
            k,
            num,
        )
        assert row["mean_before"] == cum / k
        assert row["mean_after"] == (total - cum) / (n - k)
        # Level conservation: the two segment means re-total the series.
        recon = row["mean_before"] * k + row["mean_after"] * (n - k)
        assert math.isclose(recon, total, rel_tol=1e-12)


def test_clustering_coefficient_conserves_triangles(spark):
    """Per-node triangle credits must sum to exactly 3x the global
    triangle count, and every coefficient must lie in [0, 1]."""
    lcc = _q("graph_clustering_coefficient")(spark, SF_DIR).collect()
    tri = _q("graph_triangle_cosupply")(spark, SF_DIR).collect()[0][
        "n_triangles"
    ]
    assert sum(r["n_triangles"] for r in lcc) == 3 * tri
    for r in lcc:
        assert r["deg"] >= 2
        assert 0.0 <= r["lcc"] <= 1.0
        assert r["lcc"] == 2 * r["n_triangles"] / (r["deg"] * (r["deg"] - 1))
