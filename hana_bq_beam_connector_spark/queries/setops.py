"""Set operations + distinct (SURVEY §2c set ops [X])."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hana_bq_beam_connector_spark.queries import register
from hana_bq_beam_connector_spark.sources.files import load_table


def _cust_nations(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )


def _supp_nations(spark, sf_dir):
    return load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )


@register(
    "setop_union_all",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="UNION ALL: bag union, no shuffle at all (just concatenated "
    "partitions).",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).unionByName(
        _supp_nations(spark, sf_dir)
    )


@register(
    "setop_union_distinct",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="UNION DISTINCT: union + hash-dedup shuffle on the full row.",
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _cust_nations(spark, sf_dir)
        .unionByName(_supp_nations(spark, sf_dir))
        .distinct()
    )


@register(
    "setop_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="INTERSECT (distinct semantics) — nations with both customers "
    "and suppliers.",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).intersect(
        _supp_nations(spark, sf_dir)
    )


@register(
    "setop_except",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="EXCEPT (distinct semantics) — nations with customers but no "
    "suppliers.",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).subtract(
        _supp_nations(spark, sf_dir)
    )


@register(
    "setop_intersect_all",
    """
    SELECT l_returnflag AS flag FROM lineitem WHERE l_quantity > 25
    INTERSECT ALL
    SELECT l_returnflag AS flag FROM lineitem WHERE l_discount > 0.05
    """,
    doc="INTERSECT ALL: bag intersection (min of multiplicities).",
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_quantity") > 25).select(
        F.col("l_returnflag").alias("flag")
    )
    b = li.where(F.col("l_discount") > 0.05).select(
        F.col("l_returnflag").alias("flag")
    )
    return a.intersectAll(b)


@register(
    "setop_except_all",
    """
    SELECT l_returnflag AS flag FROM lineitem WHERE l_quantity > 25
    EXCEPT ALL
    SELECT l_returnflag AS flag FROM lineitem WHERE l_discount > 0.05
    """,
    doc="EXCEPT ALL: bag difference (multiplicity subtraction).",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_quantity") > 25).select(
        F.col("l_returnflag").alias("flag")
    )
    b = li.where(F.col("l_discount") > 0.05).select(
        F.col("l_returnflag").alias("flag")
    )
    return a.exceptAll(b)


@register(
    "distinct_flag_pairs",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    doc="DISTINCT projection — hash-dedup on the projected pair only "
    "(column pruning keeps the scan to 2 columns).",
)
def distinct_flag_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()
