"""Backfill planning — diff the source's populated time buckets
against the sink's and emit contiguous copy ranges.

The reference can only be pointed at one [startTime, ∞) window per
run (HanaToBQ.java:206-218); when a sink has *holes* (a failed run, a
retention gap, a late-arriving partition) the operator that answers
"which windows are missing?" is this planner.  Its output ranges feed
``equi_depth_intervals`` / the copy pipeline directly, one range per
run — turning gap repair into the same chunked-copy primitive.

Plan shape: both sides reduce to DISTINCT bucket ids (O(buckets)
rows — day buckets of a decade are ~3.6k rows at any corpus size)
before the anti-join and the gaps-and-islands fold, so the global
window at the end orders a tiny domain.  The bucket projection uses
the tsdomain numeric mapping, so integral, timestamp_ntz/ltz and date
layouts all plan correctly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hana_bq_beam_connector_spark.colutil import resolve_column
from hana_bq_beam_connector_spark.tsdomain import ts_numeric

DAY_US = 86_400_000_000


def _buckets(df: DataFrame, ts_col: str, bucket: int) -> DataFrame:
    name, dtype = resolve_column(df, ts_col)
    num = ts_numeric(name, dtype)
    # pmod, not %: Spark's % truncates toward zero, which would fold
    # every pre-epoch value in (-bucket, 0) into bucket 0 — a repair
    # window that then never covers the rows it was planned for.
    return df.select(
        (num - F.pmod(num, F.lit(bucket))).alias("bucket_lo")
    ).distinct()


def backfill_ranges(
    source: DataFrame,
    sink: DataFrame | None,
    ts_col: str,
    bucket: int = DAY_US,
) -> DataFrame:
    """Contiguous half-open [range_start, range_end) ranges (in the
    timestamp column's numeric domain) covering every bucket present
    in ``source`` but absent from ``sink``.

    ``sink=None`` (no sink yet) plans a full backfill.  Returns
    columns ``(range_start, range_end, n_buckets)``.
    """
    src = _buckets(source, ts_col, bucket)
    missing = (
        src.join(_buckets(sink, ts_col, bucket), "bucket_lo", "left_anti")
        if sink is not None
        else src
    )
    rn = F.row_number().over(Window.orderBy("bucket_lo"))
    ranked = missing.select(
        "bucket_lo", (F.col("bucket_lo") - rn * F.lit(bucket)).alias("island")
    )
    return (
        ranked.groupBy("island")
        .agg(
            F.min("bucket_lo").alias("range_start"),
            (F.max("bucket_lo") + F.lit(bucket)).alias("range_end"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
        .drop("island")
        .orderBy("range_start")
    )
