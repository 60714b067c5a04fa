"""Bucketed table sink (SURVEY §2c partitioning; scale path).

Bucketing pre-shuffles a table ONCE at write time into N buckets by
key hash; every later equi-join or aggregation on that key reads the
buckets co-located and skips its Exchange entirely.  For a 100 TB
fact table joined daily against itself or its satellites, this trades
one write-time shuffle for zero read-time shuffles forever — the
single biggest repeated-shuffle eliminator Spark offers.

Spark's bucketing rides the session catalog (``saveAsTable``); plain
``.parquet(path)`` cannot carry bucket metadata.
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession


def _drop_stale(spark: SparkSession, table: str) -> None:
    # A metastore (Derby here) is per-session but the warehouse dir is
    # shared: after a crash the location can exist with no catalog
    # entry, and saveAsTable refuses (LOCATION_ALREADY_EXISTS).
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
    if warehouse.scheme in ("", "file"):
        # unquote: the conf value is a URI (%20 for spaces); qualified
        # names live under <warehouse>/<db>.db/<tbl>, unqualified under
        # the default database's directory root.
        root = unquote(warehouse.path)
        parts = table.lower().split(".")
        rel = (
            f"{parts[0]}.db/{parts[1]}" if len(parts) == 2 else parts[0]
        )
        shutil.rmtree(os.path.join(root, rel), ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) catalog table.

    ``sortBy`` additionally orders within buckets, enabling sort-merge
    joins without the sort step."""
    _drop_stale(df.sparkSession, table)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
