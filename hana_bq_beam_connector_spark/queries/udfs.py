"""UDF surface (SURVEY §2c UDF [X]): Arrow-batched scalar pandas UDF,
grouped-map applyInPandas (UDAF), and the plain SQL entry point.

UDFs are the slow path by design — everything else in this engine is
JVM expressions — so these queries exist to prove the surface works
end-to-end (Arrow batch transfer, grouped state, schema contracts),
with arithmetic chosen to stay bit-exact against the SQL oracle:
doubles are manipulated via exact integer cents (value*100 is exact
for 2-decimal data) so pandas and DuckDB produce identical bits.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from hana_bq_beam_connector_spark.queries import register
from hana_bq_beam_connector_spark.queries._util import events_us
from hana_bq_beam_connector_spark.sources.files import load_table


@register(
    "udf_pandas_scalar",
    """
    SELECT event_id, value,
           value * 0.5 + 1.0 AS boosted,
           CAST(ROUND(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT)
             AS value_cents
    FROM events
    """,
    doc="Scalar pandas UDF (Arrow-vectorized): per-element arithmetic "
    "on a double column — IEEE ops identical to the SQL oracle.  In "
    "production this slot holds the logic built-ins can't express; "
    "here it proves the Arrow path bit-exactly.",
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(DoubleType())
    def boost(v: pd.Series) -> pd.Series:
        return v * 0.5 + 1.0

    @F.pandas_udf(LongType())
    def cents(v: pd.Series) -> pd.Series:
        # exact: 2-decimal doubles scale to integers losslessly
        return (v * 100).round().astype("int64")

    ev = events_us(spark, sf_dir)
    return ev.select(
        "event_id",
        "value",
        boost("value").alias("boosted"),
        cents("value").alias("value_cents"),
    )


_DEMEAN_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
        StructField("group_mean", DoubleType()),
        StructField("demeaned", DoubleType()),
    ]
)


@register(
    "udf_grouped_map_demean",
    """
    WITH g AS (
      SELECT user_id,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
          AS group_mean
      FROM events GROUP BY user_id
    )
    SELECT e.user_id, e.event_id, e.value, g.group_mean,
           e.value - g.group_mean AS demeaned
    FROM events e JOIN g USING (user_id)
    """,
    doc="Grouped-map applyInPandas (UDAF shape): per-user demeaning "
    "with the mean computed in exact integer cents inside the UDF — "
    "bit-identical to the decimal-sum oracle.  One shuffle on the "
    "group key; each group processed as one pandas frame.",
)
def udf_grouped_map_demean(spark: SparkSession, sf_dir: str) -> DataFrame:
    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = (pdf["value"] * 100).round().astype("int64")
        # exact decimal-sum semantics: integer cents sum / 100 / n
        mean = (float(cents.sum()) / 100.0) / len(pdf)
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "value": pdf["value"],
                "group_mean": mean,
                "demeaned": pdf["value"] - mean,
            }
        )

    ev = events_us(spark, sf_dir).select("user_id", "event_id", "value")
    # Hash-repartition on the group key with an EXPLICIT partition
    # count before the grouped map (guide §2.3 stragglers / §4).  The
    # per-group pandas work is CPU-dense per byte, which AQE's
    # byte-based coalescing cannot see: at bench SF the grouped-map
    # exchange (~1.7 MB) coalesces to ONE task carrying ~4 CPU-s of
    # Python — the whole query becomes that straggler (stage profile,
    # r11 s4).  An explicit numPartitions makes THIS the exchange the
    # grouped map needs (HashPartitioning on the same key satisfies
    # the required distribution — no second exchange) and AQE never
    # coalesces user-specified repartitions.  defaultParallelism
    # derives from the session's core count, so the value is
    # scale-adaptive, and it matches the pre-AQE static
    # shuffle.partitions contract for grouped-map parallelism.
    par = spark.sparkContext.defaultParallelism
    return (
        ev.repartition(par, "user_id")
        .groupBy("user_id")
        .applyInPandas(demean, _DEMEAN_SCHEMA)
    )


@register(
    "sql_entrypoint_q6",
    """
    SELECT
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(4,3))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 through the spark.sql() entry point (temp views): "
    "proves the SQL API surface; scan-bound single-agg plan with "
    "every predicate in PushedFilters.",
)
def sql_entrypoint_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_v"
    )
    return spark.sql(
        """
        SELECT
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * CAST(l_discount AS DECIMAL(4,3))) AS DOUBLE)
            AS revenue,
          COUNT(*) AS n_items
        FROM lineitem_v
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
        """
    )


@register(
    "agg_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="Explicit GROUPING SETS (beyond rollup/cube): the three "
    "requested groupings in one expand+agg pass.",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_gs"
    )
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "udf_udtf_tokenize",
    """
    SELECT doc_id, u.pos AS pos, u.token AS token FROM (
      SELECT doc_id,
        unnest(list_transform(range(1, len(ws) + 1),
                              i -> {'pos': i, 'token': ws[i]})) AS u
      FROM (SELECT doc_id, string_split(text, ' ') AS ws
            FROM documents WHERE doc_id < 100)
    )
    """,
    doc="Python UDTF (table function): one input row fans out to one "
    "row per token with its 1-based position — the user-defined "
    "flatMap surface (Spark 4 @udtf), lateral-joined in SQL.  Slow "
    "path by design; exists to prove the UDTF contract end-to-end.",
)
def udf_udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: bigint, token: string")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate((text or "").split(" ")):
                yield i + 1, tok

    spark.udtf.register("sg_tokenize", Tokenize)
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    d.createOrReplaceTempView("sg_udtf_docs")
    return spark.sql(
        """SELECT d.doc_id, t.pos, t.token
           FROM sg_udtf_docs d, LATERAL sg_tokenize(d.text) t"""
    )


@register(
    "udf_grouped_agg_mean_cents",
    """
    SELECT user_id,
      CAST(SUM(CAST(ROUND(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT))
           AS BIGINT) AS total_cents,
      COUNT(*) AS n_events,
      CAST(CAST(SUM(CAST(ROUND(CAST(value AS DECIMAL(18,2)) * 100)
                         AS BIGINT)) AS DOUBLE)
           / COUNT(*) / 100.0 AS DOUBLE) AS mean_value
    FROM events
    GROUP BY user_id
    """,
    doc="Pandas UDAF (GROUPED_AGG pandas_udf) — the third UDF shape "
    "after scalar and grouped-map: whole-group Series in, scalar out, "
    "map-side partials NOT available (unlike JVM aggs) so groups "
    "shuffle whole; arithmetic in int64 cents, so the result is "
    "order-independent and bit-exact vs the SQL oracle.",
)
def udf_grouped_agg_mean_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(LongType())
    def sum_cents(v: pd.Series) -> int:
        # 2-decimal doubles -> exact integer cents; int64 sum is
        # associative, so partition order cannot change the result
        return int((v * 100).round().astype("int64").sum())

    @F.pandas_udf(LongType())
    def count_rows(v: pd.Series) -> int:
        # GROUPED_AGG UDFs cannot mix with JVM aggregates in one agg()
        return int(len(v))

    ev = events_us(spark, sf_dir)
    agg = ev.groupBy("user_id").agg(
        sum_cents("value").alias("total_cents"),
        count_rows("value").alias("n_events"),
    )
    return agg.select(
        "user_id",
        "total_cents",
        "n_events",
        (
            F.col("total_cents").cast("double")
            / F.col("n_events")
            / F.lit(100.0)
        ).alias("mean_value"),
    )
