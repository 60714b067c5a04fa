"""Invariant tests for the round-7 batch.

The three rank-factorization statistics (Spearman, Mann-Whitney U,
Gini) premise a LOW-CARDINALITY measured column: their cum-count rank
tables run through a single-task unpartitioned window, safe at <= ~1e4
distinct values and a silent scale trap past that.  Round 7 adds a
loud raise_error envelope guard (verdict-r6 ask #3); these tests prove
the guard FIRES on a synthetic high-cardinality column and stays
silent on the contract data.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401

from hana_bq_beam_connector_spark.queries import registry
from tests.conftest import SF_DIR


def _q(name):
    return registry()[name].fn


@pytest.fixture(scope="module")
def high_card_sf_dir(spark, tmp_path_factory):
    """A fake sf_dir whose lineitem has 20_001 DISTINCT l_quantity
    values — past the 1e4 rank-factorization envelope."""
    d = str(tmp_path_factory.mktemp("high_card_sf"))
    spark.range(20_001).selectExpr(
        "CAST(id AS DOUBLE) AS l_quantity",
        "CAST(id % 7 AS DOUBLE) / 100 AS l_discount",
        "CASE WHEN id % 2 = 0 THEN 'O' ELSE 'F' END AS l_linestatus",
    ).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    return d


@pytest.mark.parametrize(
    "name",
    [
        "stat_spearman_qty_discount",
        "stat_mannwhitney_u",
        "stat_gini_coefficient_qty",
    ],
)
def test_rank_factorization_cardinality_guard_fires(
    spark, high_card_sf_dir, name
):
    with pytest.raises(Exception, match="DISTINCT values"):
        _q(name)(spark, high_card_sf_dir).collect()


def test_spearman_guard_fires_on_second_column_too(
    spark, tmp_path_factory
):
    """The Spearman guard bounds BOTH rank tables: low-cardinality
    quantity but high-cardinality discount must still refuse."""
    d = str(tmp_path_factory.mktemp("high_card_y"))
    spark.range(20_001).selectExpr(
        "CAST(id % 50 AS DOUBLE) AS l_quantity",
        "CAST(id AS DOUBLE) AS l_discount",
        "'O' AS l_linestatus",
    ).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    with pytest.raises(Exception, match="DISTINCT values"):
        _q("stat_spearman_qty_discount")(spark, d).collect()


@pytest.mark.parametrize(
    "name",
    [
        "stat_spearman_qty_discount",
        "stat_mannwhitney_u",
        "stat_gini_coefficient_qty",
    ],
)
def test_rank_factorization_still_green_on_contract_data(spark, name):
    """On the real low-cardinality columns the guard branch is never
    taken and the statistics come back finite."""
    rows = _q(name)(spark, SF_DIR).collect()
    assert len(rows) == 1
    for v in rows[0].asDict().values():
        assert v is not None
