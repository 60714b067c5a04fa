"""Round-9 operator contracts (ADVICE round 8):

- two_phase_scan keeps a NULL partition value as a normal group
  (null-safe offset rejoin) — the one-window spelling's behavior;
- range_cols (bounded range-key prefix) leaves ranks unchanged vs the
  one-window spelling ordering by the full key;
- keep_first_by_key rejects SortOrder expressions loudly, up front.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from hana_bq_beam_connector_spark.operators.dedup import keep_first_by_key
from hana_bq_beam_connector_spark.operators.relational import (
    two_phase_rank,
    two_phase_scan,
)


def test_two_phase_scan_keeps_null_partition_group(spark):
    rows = [(None, i, 1) for i in range(1, 8)] + [
        ("g", i, 10) for i in range(1, 5)
    ]
    df = spark.createDataFrame(rows, "grp string, o int, v int").withColumn(
        "v", F.col("v").cast("long")
    )
    got = two_phase_scan(
        df, ["grp"], [F.col("o")], {"run": F.col("v")}, slices=4
    )
    want = df.withColumn(
        "run",
        F.sum("v").over(
            Window.partitionBy("grp")
            .orderBy("o")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    assert sorted(map(tuple, got.collect()), key=str) == sorted(
        map(tuple, want.collect()), key=str
    )
    # the NULL group's rows are present, with correct running sums
    nulls = {(r.o, r.run) for r in got.where(F.col("grp").isNull()).collect()}
    assert nulls == {(i, i) for i in range(1, 8)}


def test_two_phase_rank_range_prefix_matches_full_key(spark):
    # many keys sharing long prefixes: the bounded range prefix (8
    # chars here) collides heavily, yet ranks must equal the
    # one-window spelling ordering by the FULL key.
    rows = [
        ("L%d" % (i % 3), "prefix%02d-%04d" % (i % 5, (i * 37) % 100), i)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "lang string, key string, id int")
    got = two_phase_rank(
        df,
        ["lang"],
        [F.col("key"), F.col("id")],
        out="rn",
        slices=6,
        range_cols=[F.substring("key", 1, 8)],
    )
    want = df.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("lang").orderBy("key", "id")
        ),
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_recall_block_cap_divisor_and_residue_parity():
    """The round-9 block cap: B = max(1, ceil_div(n, 20000)) and the
    sample predicate doc_id % B = B-1 must agree between Python and
    DuckDB at the 20000-multiple boundaries — including B = 1, where
    id % 1 == 0 keeps EVERYONE (no cap at driver/bench SFs)."""
    import duckdb

    for n in (1, 500, 19_999, 20_000, 20_001, 39_999, 40_000,
              40_001, 200_000):
        py_b = max(1, -(-n // 20000))
        (sql_b,) = duckdb.sql(
            f"SELECT GREATEST(CAST(1 AS BIGINT), "
            f"(COUNT(*) + 19999) // 20000) FROM range({n})"
        ).fetchone()
        assert sql_b == py_b, n
        py_kept = sum(1 for i in range(n) if i % py_b == py_b - 1)
        (sql_kept,) = duckdb.sql(
            f"SELECT COUNT(*) FROM range({n}) t(i) "
            f"WHERE i % {py_b} = {py_b} - 1"
        ).fetchone()
        assert sql_kept == py_kept, n
        if py_b == 1:
            assert py_kept == n  # B = 1 keeps the whole corpus


def test_keep_first_by_key_rejects_sortorder(spark):
    df = spark.createDataFrame(
        [("a", 1, "x")], "k string, o int, payload string"
    )
    with pytest.raises(ValueError, match="SortOrder"):
        keep_first_by_key(df, ["k"], [F.col("o").desc()])
    with pytest.raises(ValueError, match="SortOrder"):
        keep_first_by_key(df, ["k"], [F.col("o").asc()])
    # plain expressions still work
    out = keep_first_by_key(df, ["k"], [F.col("o")])
    assert out.collect()[0].payload == "x"
    # ADVICE r9: detection now inspects the expression class, so a
    # value expression whose ALIAS contains the repr substring must
    # NOT false-positive (and still orders correctly).
    hostile = F.col("o").alias("x ASC NULLS FIRST")
    out = keep_first_by_key(df, ["k"], [hostile])
    assert out.collect()[0].payload == "x"
    # …and an Alias-WRAPPED SortOrder must still be rejected (review
    # r10: introspection has to unwrap Alias, or .asc().alias() slips
    # through the guard and dies later with an opaque INTERNAL_ERROR)
    with pytest.raises(ValueError, match="SortOrder"):
        keep_first_by_key(df, ["k"], [F.col("o").asc().alias("y")])


def test_is_sort_order_connect_columnalias_unwrap():
    """ADVICE r10: Spark Connect's alias expression class is named
    ColumnAlias (child in ``_child``), not Alias — the Connect branch
    of _is_sort_order must unwrap it, or .asc().alias('y') slips
    through keep_first_by_key's guard on Connect.  No Connect server
    in this container, so exercise the branch with synthetic
    expression objects carrying Connect-shaped module/class names."""
    from hana_bq_beam_connector_spark.operators.dedup import _is_sort_order

    mod = "pyspark.sql.connect.expressions"
    SortOrder = type("SortOrder", (), {"__module__": mod})
    ColumnAlias = type("ColumnAlias", (), {"__module__": mod})
    ColRef = type("ColumnReference", (), {"__module__": mod})

    def fake_col(expr):
        c = type("FakeConnectColumn", (), {})()
        c._jc = None
        c._expr = expr
        return c

    def aliased(child):
        a = ColumnAlias()
        a._child = child
        return a

    assert _is_sort_order(fake_col(SortOrder())) is True
    assert _is_sort_order(fake_col(aliased(SortOrder()))) is True
    assert _is_sort_order(fake_col(aliased(aliased(SortOrder())))) is True
    assert _is_sort_order(fake_col(ColRef())) is False
    assert _is_sort_order(fake_col(aliased(ColRef()))) is False
    # childless alias (shouldn't happen, but must not loop/throw)
    assert _is_sort_order(fake_col(ColumnAlias())) is False


def test_bigram_lm_score_semantics(spark, tmp_path):
    """Hand-computed check of the corpus bigram LM: with corpus
    {"a b", "a b", "a c"}, p(b|a) = 2/3 and p(c|a) = 1/3, so the two
    "a b" docs score 2/3 and the "a c" doc scores 1/3."""
    import pandas as pd

    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["a b", "a b", "a c"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [3, 3, 3],
        }
    ).to_parquet(str(tmp_path / "documents.parquet"))
    from hana_bq_beam_connector_spark.queries import registry

    out = {
        r["doc_id"]: (r["n_bigrams"], r["mean_cond_prob"])
        for r in registry()["curation_bigram_lm_score"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert out == {
        1: (1, 2.0 / 3.0),
        2: (1, 2.0 / 3.0),
        3: (1, 1.0 / 3.0),
    }
