"""The reference pipeline end-to-end, Spark-first (SURVEY §3).

Reference dataflow (HanaToBQ.java:246-260):
  driver: catalog → schema; sampling query → chunk intervals
  workers: one JDBC range query per interval → DBRow → TableRow
  service: BigQuery batch load (append)

Spark lifecycle equivalent: driver-side planning stays tiny Python
(interval list ≈ rows/chunk_size entries); everything row-shaped is a
lazy DataFrame so Catalyst fuses scan→filter→stringify→write into one
shuffle-free stage — the pipeline is embarrassingly parallel and the
physical plan must stay that way at 100 TB (no exchange in explain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hana_bq_beam_connector_spark.config import PipelineConfig
from hana_bq_beam_connector_spark.plans.chunking import (
    Interval,
    equi_depth_intervals,
)
from hana_bq_beam_connector_spark.sinks import parquet_append
from hana_bq_beam_connector_spark.sources.jdbc import jdbc_scan
from hana_bq_beam_connector_spark.typemap import stringify


def select_window(df: DataFrame, config: PipelineConfig) -> DataFrame:
    """Half-open ``[start_time, end_time)`` restriction on the
    timestamp column — the reference's per-chunk WHERE clause
    (HanaToBQ.java:58) with end_time honored (quirk #2 fixed).

    Bounds are interpreted in the column's canonical numeric domain
    (tsdomain: native integers for integral columns — no double cast,
    so boundary rows can never be misclassified by float rounding;
    epoch µs for timestamp/date columns).  The comparison is against
    the RAW column with a typed literal, so Catalyst pushes it into
    the scan (``PushedFilters``) — asserted in tests/test_pipeline.py.
    """
    from hana_bq_beam_connector_spark.colutil import resolve_column
    from hana_bq_beam_connector_spark.tsdomain import ts_bound_lit

    name, dtype = resolve_column(df, config.timestamp_column)
    col = F.col(name)
    cond = col >= ts_bound_lit(dtype, config.start_time)
    if config.end_time != float("inf"):
        cond = cond & (col < ts_bound_lit(dtype, config.end_time))
    return df.where(cond)


def run_copy_pipeline(
    spark: SparkSession,
    config: PipelineConfig,
    source_df: DataFrame | None = None,
) -> tuple[DataFrame, list[Interval]]:
    """Plan + build the incremental copy; returns (result_df, intervals).

    ``source_df`` supplies a non-JDBC source (the parquet test
    stand-in); with a JDBC config the intervals become one source
    partition each via ``predicates=``.  The caller (or
    :func:`run_and_append`) triggers the sink action.
    """
    if source_df is None:
        df = jdbc_scan(spark, config)  # schema probe; re-read chunked below
    else:
        df = source_df
    intervals = equi_depth_intervals(
        df,
        config.timestamp_column,
        config.chunk_size,
        config.start_time,
        config.end_time,
    )
    if source_df is None:
        from hana_bq_beam_connector_spark.colutil import resolve_column

        _, ts_dtype = resolve_column(df, config.timestamp_column)
        df = jdbc_scan(spark, config, intervals, ts_dtype=ts_dtype)
        result = df
    else:
        result = select_window(df, config)
    if config.stringify:
        result = stringify(result)
    return result, intervals


def run_and_append(
    spark: SparkSession,
    config: PipelineConfig,
    source_df: DataFrame | None = None,
) -> int:
    """Execute the copy into the configured sink; returns rows written."""
    result, _ = run_copy_pipeline(spark, config, source_df)
    if config.dest_path is None:
        raise ValueError("dest_path (or a BigQuery dataset) is required")
    n = result.count()
    parquet_append(result, config.dest_path)
    return n
