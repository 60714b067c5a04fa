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
from pyspark.sql import types as T

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


def duck_type_for(dt: T.DataType) -> str:
    """The DuckDB type an oracle column MUST declare for a Spark type.

    The driver's hasher is type-sensitive (round 3: a DuckDB windowed-SUM
    HUGEINT hash-mismatched Spark's BIGINT despite equal values), so the
    local gate now requires exact type parity — an oracle that widens to
    HUGEINT/INT128 or narrows to INTEGER is a query bug even when the
    cell values collide.
    """
    if isinstance(dt, T.LongType):
        return "BIGINT"
    if isinstance(dt, T.IntegerType):
        return "INTEGER"
    if isinstance(dt, T.ShortType):
        return "SMALLINT"
    if isinstance(dt, T.ByteType):
        return "TINYINT"
    if isinstance(dt, T.DoubleType):
        return "DOUBLE"
    if isinstance(dt, T.FloatType):
        return "FLOAT"
    if isinstance(dt, T.StringType):
        return "VARCHAR"
    if isinstance(dt, T.BooleanType):
        return "BOOLEAN"
    if isinstance(dt, T.DateType):
        return "DATE"
    if isinstance(dt, T.TimestampNTZType):
        return "TIMESTAMP"
    if isinstance(dt, T.TimestampType):
        return "TIMESTAMP WITH TIME ZONE"
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    if isinstance(dt, T.BinaryType):
        return "BLOB"
    if isinstance(dt, T.ArrayType):
        return f"{duck_type_for(dt.elementType)}[]"
    if isinstance(dt, T.MapType):
        return (
            f"MAP({duck_type_for(dt.keyType)}, "
            f"{duck_type_for(dt.valueType)})"
        )
    if isinstance(dt, T.StructType):
        inner = ", ".join(
            f"{f.name} {duck_type_for(f.dataType)}" for f in dt.fields
        )
        return f"STRUCT({inner})"
    raise TypeError(f"no DuckDB mapping for Spark type {dt!r}")


def type_mismatches(
    spark_schema: T.StructType, oracle_rel: "duckdb.DuckDBPyRelation"
) -> list[str]:
    """Element-wise (by sorted column name) Spark-vs-oracle type diffs."""
    spark_types = {f.name: duck_type_for(f.dataType) for f in spark_schema}
    oracle_types = {
        c: str(t) for c, t in zip(oracle_rel.columns, oracle_rel.types)
    }
    out: list[str] = []
    for col in sorted(set(spark_types) & set(oracle_types)):
        if spark_types[col] != oracle_types[col]:
            out.append(
                f"type[{col}]: spark={spark_types[col]} "
                f"oracle={oracle_types[col]}"
            )
    return out


def _canon(value):
    """Canonicalize one cell for multiset comparison."""
    if value is None:
        return None
    if isinstance(value, bool):
        # Tag before any numeric handling: Python's 1 == True would
        # otherwise equate a BOOLEAN column with an INT column that
        # the driver's str() comparison ('True' vs '1') rejects.
        return ("bool", value)
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

    rel = con.sql(oracle_sql)
    oracle_cols_raw = list(rel.columns)
    type_diffs = type_mismatches(sdf.schema, rel)
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
    mismatches.extend(type_diffs)
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
