"""Declared query registry — the oracle-checkable engine surface.

Every operator in SURVEY.md §2c lands here as a named entry pairing a
PySpark implementation with (where SQL-expressible) an equivalent
DuckDB oracle SQL string over the driver's testdata views.  The driver
runs both at sf0.01 and compares row-count + schema + value-hash
(CORRECTNESS_r{N}.json); tests/test_oracle.py runs the same comparison
locally at sf0.001.

Determinism conventions (so hashes match exactly, not approximately):

* double-typed measures are aggregated through ``DECIMAL(18,2)`` casts
  in BOTH engines (decimal arithmetic is exact) and the final value is
  cast back to ``double`` — bit-identical results on both sides
  PROVIDED the sum's unscaled integer stays under 2^53 (above it, the
  decimal→double cast itself rounds differently across engines — one
  correctly-rounded conversion vs int/10^scale in doubles).  For
  high-scale sums that outgrow the envelope (e.g. Q1's scale-8 charge)
  split FLOOR(s) + (s - FLOOR(s)): each part casts exactly, and the
  single IEEE add is correctly rounded in both engines at any scale
  factor;
* ratios/averages divide that exact decimal-sum (as double) by the
  exact count — one IEEE division of identical operands;
* ``events.ts`` ships today as parquet TIMESTAMP(MICROS) NTZ; queries
  expose it as epoch µs via ``_util.events_us`` (which dispatches on
  the actual column dtype, so the legacy int64-ns and LTZ layouts
  keep working) and DuckDB mirrors with ``epoch_us(ts)``;
* every computed column is aliased identically in both engines (the
  driver sorts columns by name before hashing);
* anything ordering-sensitive (top-k) breaks ties on a unique key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None → non-SQL-expressible; rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a (spark_fn, oracle_sql) pair to the registry."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def registry() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


def spark_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in registry().items()}


def oracle_queries() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in registry().items()
        if spec.oracle is not None
    }


_LOADED = False


def _load_all() -> None:
    """Import every query module exactly once to populate the registry."""
    global _LOADED
    if _LOADED:
        return
    from hana_bq_beam_connector_spark.queries import (  # noqa: F401
        advanced,
        behavior,
        curation,
        dedup,
        drift,
        entity,
        etl,
        experiment,
        geo,
        graph,
        multimodal,
        privacy,
        profiling,
        rec,
        relational,
        sampling,
        scalar,
        setops,
        similarity,
        sketches,
        stats,
        streaming,
        text,
        timeseries,
        tpch_more,
        udfs,
        windows,
    )

    _LOADED = True
