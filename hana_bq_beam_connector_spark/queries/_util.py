"""Shared helpers enforcing the registry's determinism conventions."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hana_bq_beam_connector_spark.sources.files import load_table

# Exact-arithmetic casts for double measures (see queries/__init__ doc).
DEC = "decimal(18,2)"  # prices/quantities
DEC_RATE = "decimal(4,3)"  # discounts/taxes in [0,1)


def dec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def rate(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC_RATE)


def sum_dec_as_double(col: str | Column, alias: str) -> Column:
    """SUM through exact decimal, surfaced as double (bit-identical to
    DuckDB's ``CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)``)."""
    c = dec(col) if isinstance(col, str) else col
    return F.sum(c).cast("double").alias(alias)


def avg_dec_as_double(col: str | Column, alias: str) -> Column:
    """Exact decimal sum divided by exact count — one IEEE division."""
    c = dec(col) if isinstance(col, str) else col
    target = col if isinstance(col, str) else None
    count = F.count(F.col(target)) if target else F.count(F.lit(1))
    return (F.sum(c).cast("double") / count).alias(alias)


def events_us(
    spark: SparkSession,
    sf_dir: str,
    lo_us: int | None = None,
    hi_us: int | None = None,
) -> DataFrame:
    """events with ts as epoch microseconds (ns div 1000), matching
    DuckDB's truncated read of the TIMESTAMP(NANOS) column.

    Window bounds are applied on the RAW nanosecond column *before*
    the µs projection: a filter on ``ts div 1000`` cannot be pushed
    into the parquet scan (only IsNotNull survives), a filter on
    ``ts`` reaches PushedFilters and prunes row groups — the
    difference between scanning a day and scanning a year at 100 TB.
    Bounds must be µs-aligned (they are second-aligned in practice),
    making ``ts >= lo_us*1000`` ≡ ``ts div 1000 >= lo_us``.
    """
    ev = load_table(spark, sf_dir, "events")
    if lo_us is not None:
        ev = ev.where(F.col("ts") >= lo_us * 1000)
    if hi_us is not None:
        ev = ev.where(F.col("ts") < hi_us * 1000)
    return ev.select(
        "event_id",
        F.expr("ts div 1000").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


# Oracle-side fragments (kept next to their Spark twins above).
def SQL_SUM_DEC(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE) AS {alias}"


def SQL_AVG_DEC(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE) / "
        f"COUNT({expr}) AS {alias}"
    )
