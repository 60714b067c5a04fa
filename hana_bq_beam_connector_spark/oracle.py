"""Local DuckDB-oracle comparison harness.

Replicates the driver's correctness gate (CORRECTNESS_r{N}.json):
run a registry query in Spark and its oracle SQL in DuckDB over the
same parquet tables, then compare row count, column-name set, and the
order-insensitive multiset of rows — with STRICT value equality
(including floats: the registry's determinism conventions are designed
to make both engines produce bit-identical values, so any drift is a
query bug, not noise to tolerate).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field
from decimal import Decimal

import duckdb
from pyspark.sql import SparkSession

from hana_bq_beam_connector_spark.sources.files import TESTDATA_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """A connection with the driver's table views pre-registered."""
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _canon(value):
    """Canonicalize one cell for multiset comparison."""
    if value is None:
        return None
    if isinstance(value, Decimal):
        return ("dec", str(value.normalize()))
    if isinstance(value, float):
        if math.isnan(value):
            return ("f", "nan")
        return ("f", repr(value))
    if isinstance(value, bytes):
        return ("b", value)
    if isinstance(value, (list, tuple)):
        return tuple(_canon(v) for v in value)
    return value


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    mismatches: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK " if self.ok else "FAIL"
        detail = "" if self.ok else " | " + "; ".join(self.mismatches[:5])
        return (
            f"[{status}] {self.name}: spark={self.spark_rows} "
            f"oracle={self.oracle_rows}{detail}"
        )


def compare_query(
    spark: SparkSession,
    con: duckdb.DuckDBPyConnection,
    name: str,
    fn,
    oracle_sql: str,
    sf_dir: str,
) -> CompareResult:
    sdf = fn(spark, sf_dir)
    spark_cols = sorted(sdf.columns)
    spark_rows = [
        tuple(_canon(row[c]) for c in spark_cols) for row in sdf.collect()
    ]

    rel = con.execute(oracle_sql)
    oracle_cols_raw = [d[0] for d in rel.description]
    oracle_sorted_idx = sorted(
        range(len(oracle_cols_raw)), key=lambda i: oracle_cols_raw[i]
    )
    oracle_cols = [oracle_cols_raw[i] for i in oracle_sorted_idx]
    oracle_rows = [
        tuple(_canon(row[i]) for i in oracle_sorted_idx)
        for row in rel.fetchall()
    ]

    mismatches: list[str] = []
    if spark_cols != oracle_cols:
        mismatches.append(f"columns: spark={spark_cols} oracle={oracle_cols}")
    if len(spark_rows) != len(oracle_rows):
        mismatches.append(
            f"rowcount: spark={len(spark_rows)} oracle={len(oracle_rows)}"
        )
    if not mismatches:
        s_sorted = sorted(spark_rows, key=repr)
        o_sorted = sorted(oracle_rows, key=repr)
        if s_sorted != o_sorted:
            for i, (a, b) in enumerate(zip(s_sorted, o_sorted)):
                if a != b:
                    mismatches.append(f"row[{i}]: spark={a!r} oracle={b!r}")
                    if len(mismatches) >= 5:
                        break
    return CompareResult(
        name=name,
        ok=not mismatches,
        spark_rows=len(spark_rows),
        oracle_rows=len(oracle_rows),
        mismatches=mismatches,
    )
