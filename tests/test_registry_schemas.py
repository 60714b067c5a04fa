"""No registry query may emit a complex-typed (array/map/struct) column.

The driver's correctness gate canonicalizes results through pandas and
hashes cell values; list-valued cells raise ``TypeError: unhashable
type: 'list'`` inside pandas' hash table (round 10's only red row:
``text_inverted_index`` emitted ``sample_postings array<long>``).  The
registry contract is therefore FLAT OUTPUT TYPES ONLY — nested data is
fine mid-plan, but the final projection must stringify or explode it.

Two sweeps, both metadata-only:

* Spark side: build each query's DataFrame (plan analysis, no
  execution) and reject Array/Map/Struct fields in the result schema.
* Oracle side: bind each oracle SQL in DuckDB and reject LIST/STRUCT/
  MAP column types (DuckDB prints lists as ``T[]``).
"""

from __future__ import annotations

import pytest

from pyspark.sql.types import ArrayType, MapType, StructType

from hana_bq_beam_connector_spark.oracle import duckdb_connection
from hana_bq_beam_connector_spark.queries import registry

_SPECS = list(registry().values())


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("spec", _SPECS, ids=[s.name for s in _SPECS])
def test_spark_output_schema_is_flat(spark, sf_dir, spec):
    df = spec.fn(spark, sf_dir)
    complex_cols = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"{spec.name} emits complex-typed output columns the driver's "
        f"pandas canonicalizer cannot hash — stringify them "
        f"(array_join/to_json) in the final projection: {complex_cols}"
    )


def test_oracle_output_types_are_flat(con):
    offenders: list[str] = []
    for spec in _SPECS:
        if spec.oracle is None:
            continue
        rel = con.sql(spec.oracle)
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ)
            if "[]" in t or t.split("(")[0] in ("STRUCT", "MAP", "LIST", "UNION"):
                offenders.append(f"{spec.name}.{col}: {t}")
    assert not offenders, (
        "oracle columns with nested types (stringify them with "
        f"array_to_string/to_json in the oracle SQL): {offenders}"
    )
