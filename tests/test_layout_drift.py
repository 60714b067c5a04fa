"""Timestamp-layout drift-proofing (queries/_util contract).

The testdata's ``events.ts`` has shipped as three different physical
layouts across driver revisions: parquet TIMESTAMP(NANOS) read as
int64 nanoseconds (``nanosAsLong``), TIMESTAMP(MICROS)
isAdjustedToUTC=true (``timestamp`` / LTZ), and today's
TIMESTAMP(MICROS) NTZ.  ``queries/_util`` dispatches on the read
dtype so every events query produces identical results on all three.
This test materializes the SAME instants in each layout and asserts
representative queries are value-identical — so the next layout flip
cannot silently break one path (the round-1 failure mode).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hana_bq_beam_connector_spark.queries import registry
from hana_bq_beam_connector_spark.sources.files import load_table

# events-only queries that exercise the ts dispatch end-to-end:
# window filter + µs projection, windowed agg, sessionization, as-of.
QUERIES = [
    "etl_window_copy",
    "stream_tumbling_1h",
    "stream_session_windows",
    "join_asof_purchase_click",
]


@pytest.fixture(scope="module")
def layout_dirs(spark, sf_dir, tmp_path_factory):
    """One directory per layout, same instants in all three."""
    base = load_table(spark, str(sf_dir), "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    variants = {
        "ntz": base,
        "ltz": base.withColumn("ts", F.timestamp_micros(us)),
        "ns_int64": base.withColumn("ts", us * F.lit(1000)),
    }
    dirs = {}
    for name, df in variants.items():
        d = tmp_path_factory.mktemp(f"events_{name}")
        df.write.mode("overwrite").parquet(str(d / "events.parquet"))
        dirs[name] = str(d)
    # queries may read other tables too — link them in
    import os

    for name, d in dirs.items():
        for t in os.listdir(str(sf_dir)):
            if t != "events.parquet" and t.endswith(".parquet"):
                os.symlink(
                    os.path.join(str(sf_dir), t), os.path.join(d, t)
                )
    return dirs


@pytest.mark.parametrize("qname", QUERIES)
def test_layouts_produce_identical_results(spark, layout_dirs, qname):
    fn = registry()[qname].fn
    results = {}
    for layout, d in layout_dirs.items():
        df = fn(spark, d)
        cols = sorted(df.columns)
        results[layout] = sorted(
            tuple(str(r[c]) for c in cols) for r in df.collect()
        )
    assert results["ntz"] == results["ltz"] == results["ns_int64"]
    assert len(results["ntz"]) > 0
