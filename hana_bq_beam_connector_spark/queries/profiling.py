"""Dataset-profiling / multi-criteria analytics (SURVEY §2c
aggregation [X] extensions).

The reference's only schema introspection is the driver-side catalog
query (`HanaToBQ.java:104-143`); column profiling, skyline queries and
score-tier segmentation are engine extensions.

Scale notes per query are in each docstring; the common theme is that
anything "global" (a frontier, a quantile tier) is first reduced
per-group or per-partition so the global step sees a tiny input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hana_bq_beam_connector_spark.queries import register
from hana_bq_beam_connector_spark.queries._util import sum_dec_as_double
from hana_bq_beam_connector_spark.sources.files import load_table


@register(
    "agg_pareto_frontier",
    """
    WITH best AS (
      SELECT p_retailprice, MAX(p_size) AS p_size
      FROM part GROUP BY p_retailprice
    )
    SELECT p_retailprice, p_size FROM best b
    WHERE NOT EXISTS (
      SELECT 1 FROM best o
      WHERE o.p_retailprice < b.p_retailprice AND o.p_size >= b.p_size
    )
    """,
    doc="2-D Pareto frontier (skyline): parts optimal on (min "
    "retailprice, max size).  Exact two-phase plan: (1) reduce to the "
    "max size per distinct price — one hash shuffle, after which any "
    "same-price-smaller-size point is gone; (2) a running-max window "
    "over the price-sorted survivors keeps a point only if every "
    "cheaper price has a strictly smaller max size.  The global sort "
    "in phase 2 touches ONE ROW PER DISTINCT PRICE, not the fact "
    "table — the naive NOT-EXISTS dominance check the oracle runs is "
    "O(n²) and would never survive scale.",
)
def agg_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    best = p.groupBy("p_retailprice").agg(F.max("p_size").alias("p_size"))
    w = (
        Window.orderBy(F.col("p_retailprice").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run_max = F.max("p_size").over(w)
    return best.withColumn("__m", run_max).where(
        F.col("__m").isNull() | (F.col("__m") < F.col("p_size"))
    ).drop("__m")


@register(
    "agg_rfm_segments",
    """
    WITH rfm AS (
      SELECT o_custkey AS custkey,
             MAX(o_orderdate) AS last_order,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS monetary
      FROM orders GROUP BY o_custkey
    ),
    tiles AS (
      SELECT custkey,
             NTILE(4) OVER (ORDER BY last_order DESC, custkey) AS r_tile,
             NTILE(4) OVER (ORDER BY frequency DESC, custkey) AS f_tile,
             NTILE(4) OVER (ORDER BY monetary DESC, custkey) AS m_tile
      FROM rfm
    )
    SELECT r_tile, f_tile, m_tile, COUNT(*) AS n_customers
    FROM tiles GROUP BY r_tile, f_tile, m_tile
    """,
    doc="RFM segmentation: per-customer recency / frequency / monetary "
    "from one orders aggregate, NTILE(4) tier per axis (ties broken by "
    "custkey so tile assignment is deterministic), then segment "
    "counts.  The NTILE global sorts run over ONE ROW PER CUSTOMER "
    "(already reduced), not over orders; at 100 TB the same tiering is "
    "done with approx-quantile thresholds broadcast as a filter — the "
    "pattern curation_quality_quantile_sketch demonstrates.",
)
def agg_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    rfm = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        sum_dec_as_double("o_totalprice", "monetary"),
    )
    tiles = rfm.select(
        "custkey",
        F.ntile(4)
        .over(Window.orderBy(F.col("last_order").desc(), "custkey"))
        .cast("long")
        .alias("r_tile"),
        F.ntile(4)
        .over(Window.orderBy(F.col("frequency").desc(), "custkey"))
        .cast("long")
        .alias("f_tile"),
        F.ntile(4)
        .over(Window.orderBy(F.col("monetary").desc(), "custkey"))
        .cast("long")
        .alias("m_tile"),
    )
    return tiles.groupBy("r_tile", "f_tile", "m_tile").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@register(
    "agg_profile_columns",
    """
    WITH s AS (
      SELECT 'o_orderstatus' AS col_name, o_orderstatus AS val FROM orders
      UNION ALL
      SELECT 'o_orderpriority', o_orderpriority FROM orders
      UNION ALL
      SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
    )
    SELECT col_name,
           COUNT(*) AS n_rows,
           COUNT(val) AS n_nonnull,
           COUNT(DISTINCT val) AS n_distinct,
           MIN(val) AS min_val,
           MAX(val) AS max_val
    FROM s GROUP BY col_name
    """,
    doc="Column-profiling operator (the `df.summary()` engine surface "
    "as an oracle-checked query): one unpivoted pass computes row / "
    "non-null / exact-distinct counts and lexicographic min-max per "
    "column.  stack() inflates rows ×3 but map-side partial "
    "aggregation collapses them before the single shuffle; at 100 TB "
    "swap COUNT(DISTINCT) for approx_count_distinct (HLL, "
    "one-pass, mergeable — sketch_* queries show the machinery) and "
    "the profile becomes shuffle-light regardless of column count.",
)
def agg_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    stacked = o.select(
        F.expr(
            "stack(3, "
            "'o_orderstatus', o_orderstatus, "
            "'o_orderpriority', o_orderpriority, "
            "'o_custkey', CAST(o_custkey AS STRING)"
            ") AS (col_name, val)"
        )
    )
    return stacked.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("val").alias("n_nonnull"),
        F.countDistinct("val").alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )


_FK_EDGES = [
    # (edge label, fact table, fact key, dim table, dim key)
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


@register(
    "agg_fk_integrity",
    "\nUNION ALL\n".join(
        f"""
    SELECT '{edge}' AS edge, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN d.{dk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_orphans
    FROM {ft} f LEFT JOIN (SELECT DISTINCT {dk} FROM {dt}) d
      ON f.{fk} = d.{dk}"""
        for edge, ft, fk, dt, dk in _FK_EDGES
    ),
    doc="Referential-integrity audit over every FK edge of the star "
    "schema: per edge, total rows and orphan rows (fact keys missing "
    "from the dimension).  Each edge is one left join + aggregate; "
    "every dimension side is distinct-projected to its key column "
    "and broadcast (dims are MBs when facts are TBs), so no fact "
    "table ever shuffles — the audit costs one scan per fact table "
    "at any scale.  The kind of data-quality gate a 100 TB ingest "
    "runs before publishing a snapshot.",
)
def agg_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for edge, ft, fk, dt, dk in _FK_EDGES:
        fact = load_table(spark, sf_dir, ft).select(fk)
        dim = load_table(spark, sf_dir, dt).select(dk).distinct()
        joined = fact.join(F.broadcast(dim), fact[fk] == dim[dk], "left")
        branch = joined.agg(
            F.lit(edge).alias("edge"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(dim[dk].isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_orphans"),
        )
        out = branch if out is None else out.unionByName(branch)
    return out


@register(
    "agg_weighted_median",
    """
    WITH ranked AS (
      SELECT l_returnflag,
        l_extendedprice,
        SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
          PARTITION BY l_returnflag
          ORDER BY l_extendedprice, l_orderkey, l_linenumber
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS cum_w,
        SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
          PARTITION BY l_returnflag
        ) AS tot_w
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(MIN(l_extendedprice) AS DOUBLE) AS weighted_median
    FROM ranked WHERE 2 * cum_w >= tot_w
    GROUP BY l_returnflag
    """,
    doc="Exact weighted median of extended price per return flag, "
    "weighted by quantity — two-phase bucket histogram, because "
    "lineitem has THREE return flags at any scale: the naive "
    "per-group window sorts n/3 rows per task (measured 164s at "
    "sf10, 60M rows).  Phase 1 folds the fact table to per-(flag, "
    "price/64-bucket) exact-decimal weight partials (one map-side-"
    "combined shuffle, O(price-domain/64) rows), a tiny bucket "
    "window finds each flag's crossing bucket and the cumulative "
    "weight BEFORE it, and phase 2 re-scans only the crossing "
    "bucket's rows (broadcast semi-filter) for the exact per-row "
    "crossing.  The answer is provably the naive spelling's: rows "
    "sorted by price have monotone cumulative weight, so the first "
    "crossing row lies in the first bucket whose end-cumulative "
    "crosses half — MIN(price) over in-bucket rows with "
    "2*(prior + cum_in) >= tot is the same price the full sort "
    "would pick.  Bucket id floor(price/64) divides by a power of "
    "two (exact in IEEE); all weight sums stay decimal-exact.  The "
    "oracle keeps the one-window naive SQL — same rows, same "
    "doubles, different plan.",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity",
        "l_orderkey", "l_linenumber",
    )
    wq = F.col("l_quantity").cast("decimal(18,2)")
    bucket = F.floor(F.col("l_extendedprice") / F.lit(64.0)).alias("bucket")
    # Phase 1: exact weight per (flag, price bucket) — the only
    # full-table shuffle, partial-aggregated map-side.
    hist = li.select("l_returnflag", bucket, wq.alias("w")).groupBy(
        "l_returnflag", "bucket"
    ).agg(F.sum("w").alias("bw"))
    cum_b = Window.partitionBy("l_returnflag").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot_b = Window.partitionBy("l_returnflag")
    ranked_b = hist.select(
        "l_returnflag",
        "bucket",
        (F.sum("bw").over(cum_b) - F.col("bw")).alias("prior_w"),
        F.sum("bw").over(cum_b).alias("cum_bw"),
        F.sum("bw").over(tot_b).alias("tot_w"),
    )
    # First bucket whose end-cumulative crosses half the total; the
    # struct MIN orders by bucket id, carrying that bucket's prior
    # cumulative and the flag's total along.
    crossing = (
        ranked_b.where(F.lit(2) * F.col("cum_bw") >= F.col("tot_w"))
        .groupBy("l_returnflag")
        .agg(F.min(F.struct("bucket", "prior_w", "tot_w")).alias("c"))
        .select(
            F.col("l_returnflag").alias("c_flag"),
            F.col("c.bucket").alias("c_bucket"),
            F.col("c.prior_w").alias("prior_w"),
            F.col("c.tot_w").alias("tot_w"),
        )
    )
    # Phase 2: exact crossing inside the one crossing bucket per flag
    # (O(rows-per-bucket) window input, never O(group)).
    in_bucket = li.join(
        F.broadcast(crossing),
        (li["l_returnflag"] == F.col("c_flag"))
        & (
            F.floor(li["l_extendedprice"] / F.lit(64.0))
            == F.col("c_bucket")
        ),
    ).select(
        li["l_returnflag"],
        "l_extendedprice",
        wq.alias("w"),
        "l_orderkey",
        "l_linenumber",
        "prior_w",
        "tot_w",
    )
    cum_in = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        in_bucket.withColumn("cum_w", F.col("prior_w") + F.sum("w").over(cum_in))
        .where(F.lit(2) * F.col("cum_w") >= F.col("tot_w"))
        .groupBy("l_returnflag")
        .agg(F.min("l_extendedprice").cast("double").alias("weighted_median"))
    )


@register(
    "agg_pareto_cut_8020",
    """
    WITH rev AS (
      SELECT l_returnflag, l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS r
      FROM lineitem GROUP BY l_returnflag, l_partkey
    ),
    ranked AS (
      SELECT l_returnflag, r,
        SUM(r) OVER (
          PARTITION BY l_returnflag ORDER BY r DESC, l_partkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS cum,
        SUM(r) OVER (PARTITION BY l_returnflag) AS tot
      FROM rev
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_parts_total,
           CAST(SUM(CASE WHEN 5 * (cum - r) < 4 * tot THEN 1 ELSE 0 END)
                AS BIGINT) AS n_parts_80pct,
           CAST(SUM(r) AS DOUBLE) AS revenue_total
    FROM ranked GROUP BY l_returnflag
    """,
    doc="Revenue concentration (the 80/20 cut): per return flag, how "
    "many parts cover 80% of revenue — counted as rows whose "
    "PRECEDING cumulative share is still under 80%, so the crossing "
    "part is included.  The 5·cum < 4·tot compare is decimal-exact "
    "(no 0.8 float threshold at the boundary).  Phase 1 reduces the "
    "fact table to one row per (flag, part) before any cumulative "
    "work — but the part DOMAIN grows with the corpus and there are "
    "only three flags, so the running revenue comes from "
    "two_phase_scan over the (r DESC, partkey) order (range-"
    "partitioned slice-local sums + offsets), never a per-flag "
    "window sorting the whole part domain in one task; totals ride "
    "a broadcast agg.",
)
def agg_pareto_cut_8020(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hana_bq_beam_connector_spark.operators.relational import (
        two_phase_scan,
    )

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_returnflag", "l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("r")
    )
    tot_by = rev.groupBy("l_returnflag").agg(F.sum("r").alias("tot"))
    ranked = two_phase_scan(
        rev,
        ["l_returnflag"],
        [F.col("r").desc(), F.col("l_partkey")],
        {"cum": F.col("r")},
    ).join(F.broadcast(tot_by), "l_returnflag")
    return ranked.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_parts_total"),
        F.sum(
            F.when(
                F.lit(5) * (F.col("cum") - F.col("r"))
                < F.lit(4) * F.col("tot"),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_parts_80pct"),
        F.sum("r").cast("double").alias("revenue_total"),
    )


@register(
    "agg_gini_diversity",
    """
    WITH c AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY lang, source
    )
    SELECT lang,
      CAST(SUM(n) AS BIGINT) AS n_docs,
      CAST(COUNT(*) AS BIGINT) AS n_sources,
      CAST(SUM(n) * SUM(n) - SUM(n * n) AS DOUBLE)
        / CAST(SUM(n) * SUM(n) AS DOUBLE) AS gini_diversity
    FROM c GROUP BY lang
    """,
    doc="Source-diversity (Gini impurity) per language: 1 - Σp² "
    "spelled as (N² - Σnᵢ²)/N² — the numerator and denominator stay "
    "EXACT int64 (no per-source float shares, no libm entropy log), "
    "so the single final division is bit-identical across engines.  "
    "The corpus-mixing health metric: 0 = one source dominates, "
    "→(k-1)/k = evenly mixed over k sources.  Two partial-aggregated "
    "shuffles of O(lang × source) rows — corpus-size-independent.",
)
def agg_gini_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("lang", "source")
    c = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    tot = F.sum("n")
    sq = F.sum(F.col("n") * F.col("n"))
    return c.groupBy("lang").agg(
        tot.cast("long").alias("n_docs"),
        F.count(F.lit(1)).alias("n_sources"),
        ((tot * tot - sq).cast("double") / (tot * tot).cast("double")).alias(
            "gini_diversity"
        ),
    )


@register(
    "agg_benford_first_digit",
    """
    WITH d AS (
      SELECT CAST(SUBSTR(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                               * 100 AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit
      FROM orders WHERE o_totalprice > 0
    )
    SELECT digit, COUNT(*) AS n_rows,
           CAST(COUNT(*) AS DOUBLE)
             / CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS share
    FROM d GROUP BY digit
    """,
    doc="Benford first-significant-digit profile of the money column — "
    "the classic fabricated-data / unit-mixup smoke test: a natural "
    "multi-magnitude amount column leans on small leading digits, a "
    "capped or synthetic one goes flat.  The digit is extracted "
    "through exact arithmetic (decimal cents -> bigint -> string "
    "head), never log10 or double formatting, so both engines agree "
    "bit-for-bit; shares are one IEEE division over the 9-row "
    "aggregate.",
)
def agg_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    cents = (
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .cast("string")
    )
    d = o.select(F.substring(cents, 1, 1).cast("bigint").alias("digit"))
    counts = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n_rows"))
    w = Window.partitionBy()
    return counts.withColumn(
        "share",
        F.col("n_rows").cast("double")
        / F.sum("n_rows").over(w).cast("double"),
    )
