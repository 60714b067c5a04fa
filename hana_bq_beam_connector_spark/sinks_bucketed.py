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
        if len(parts) == 1:
            rel = parts[0]
        elif len(parts) == 2:
            rel = f"{parts[0]}.db/{parts[1]}"
        elif len(parts) == 3:
            # catalog.db.tbl: the warehouse path never contains the
            # catalog segment — rmtree'ing '<warehouse>/<catalog>'
            # would miss the stale dir AND could delete an unrelated
            # one that happens to share the catalog's name.
            rel = f"{parts[1]}.db/{parts[2]}"
        else:
            raise ValueError(
                f"write_bucketed: unexpected table name shape {table!r} "
                "(want tbl, db.tbl, or catalog.db.tbl)"
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
