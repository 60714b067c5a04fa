"""File-format sources (SURVEY §2c sources [P/X]).

The reference reads only JDBC; the engine adds the lakehouse path.
All readers are thin: the point is that Catalyst's datasource V2 scan
does pushdown/pruning (``PushedFilters``/``ReadSchema`` in explain),
so we never pre-materialize.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    # Legacy-layout support: the testdata once shipped events.ts as
    # parquet TIMESTAMP(NANOS), which Spark 4 aborts on unless read as
    # int64 nanoseconds.  Today's layout is TIMESTAMP(MICROS) NTZ
    # (untouched by this conf), but it is set dynamically — not only
    # in our session factory — because the driver's verify harness
    # calls queries() with its own session, and queries/_util
    # dispatches on the resulting dtype either way.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession, path: str, *, header: bool = True, infer: bool = True
) -> DataFrame:
    return spark.read.csv(path, header=header, inferSchema=infer)


def read_json(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — the other columnar lakehouse format Spark ships a
    native vectorized reader for.  Same pushdown story as parquet:
    predicates and column pruning reach the ORC stripe reader
    (``PushedFilters``/``ReadSchema``), so the engine treats the two
    formats interchangeably."""
    return spark.read.orc(path)


def read_binary_files(
    spark: SparkSession, path: str, *, glob: str | None = None
) -> DataFrame:
    """Raw-media ingest: one row per file with the opaque payload.

    ``binaryFile`` is the multimodal on-ramp — images/audio/video land
    as ``(path, modificationTime, length, content binary)`` rows that
    feed the operators/multimodal.py stages.  Scale notes: the scan
    parallelizes per-file (no splitting inside a file), pathGlobFilter
    prunes at listing time, and
    ``spark.sql.sources.binaryFile.maxLength`` guards against a single
    oversized blob OOMing an executor; for billions of small files,
    compact into parquet with a binary column first (small-files
    problem) — which is exactly what pairing this reader with the
    parquet sink does.
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table (TESTDATA.md)."""
    return read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}
