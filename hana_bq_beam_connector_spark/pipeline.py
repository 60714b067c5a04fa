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
        _assert_jdbc_tz_consistent(spark, ts_dtype)
        df = jdbc_scan(spark, config, intervals, ts_dtype=ts_dtype)
        result = df
    else:
        result = select_window(df, config)
    if config.stringify:
        result = stringify(result)
    return result, intervals


def _assert_jdbc_tz_consistent(spark: SparkSession, ts_dtype: str) -> None:
    """Fail fast when chunk predicates on an LTZ timestamp column
    would be interpreted in a different timezone than they were
    planned in.

    Interval bounds are epoch-µs instants computed under the SESSION
    timezone, rendered as naive ``{ts '...'}`` wall-clock strings —
    which the JDBC driver and the remote database interpret in the
    JVM default timezone.  If the two differ, every chunk window
    silently shifts by the offset and boundary rows are dropped or
    double-scanned.  NTZ and date columns are naive on both sides and
    unaffected."""
    if ts_dtype != "timestamp":  # only LTZ semantics are tz-sensitive
        return
    jvm_tz = (
        spark.sparkContext._jvm.java.util.TimeZone.getDefault().getID()
    )
    sess_tz = spark.conf.get("spark.sql.session.timeZone")
    utc_names = {"UTC", "Etc/UTC", "GMT", "Z", "+00:00"}
    if jvm_tz == sess_tz or (jvm_tz in utc_names and sess_tz in utc_names):
        return
    raise RuntimeError(
        f"JDBC chunked scan over an LTZ timestamp column: the JVM "
        f"default timezone ({jvm_tz!r}) differs from the Spark session "
        f"timezone ({sess_tz!r}) — chunk-predicate wall-clock literals "
        "would be interpreted with a different offset than they were "
        "planned with, silently shifting every scan window.  Align "
        "them (e.g. -Duser.timezone=UTC and "
        "spark.sql.session.timeZone=UTC) or store the column as "
        "TIMESTAMP_NTZ."
    )


def run_and_append(
    spark: SparkSession,
    config: PipelineConfig,
    source_df: DataFrame | None = None,
) -> int:
    """Execute the copy into the configured sink; returns rows written.

    The row count rides the write itself via an ``Observation`` — one
    source pass, and the number reported is exactly what the sink
    received (a separate pre-count would re-scan the source and could
    disagree with the write under concurrent source inserts)."""
    from pyspark.sql import Observation

    result, _ = run_copy_pipeline(spark, config, source_df)
    if config.dest_path is None:
        raise ValueError("dest_path (or a BigQuery dataset) is required")
    obs = Observation()
    observed = result.observe(obs, F.count(F.lit(1)).alias("n"))
    parquet_append(observed, config.dest_path)
    return int(obs.get["n"])
