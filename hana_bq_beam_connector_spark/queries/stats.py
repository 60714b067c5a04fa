"""Statistics / feature-engineering queries (SURVEY §2c statistics
[X] — NEW group, round 5).

The feature steps a training pipeline runs before the model sees any
data: correlation screens, closed-form regression, target encoding,
the hashing trick, independence tests, outlier gating, impurity
scores.  The reference has none of this (its 439 LoC copy rows
verbatim); every query here is an engine extension.

Determinism doctrine (the registry's double rule, applied to second
moments): every SUM runs through exact DECIMAL — including product
moments like Σxy, whose DECIMAL(18,2)×DECIMAL(18,2) products are
exact in both engines — and the closing formula (Pearson r, slope,
χ², z-bounds) is ONE textually identical IEEE expression over those
exact sums, so Spark and DuckDB produce bit-identical doubles.  No
query aggregates raw doubles across rows (partition-order-dependent)
— where a sum of squares is needed over category COUNTS (Gini), it
stays in exact integers until a single final division.

Scale: every query is one (or two) map-side-combinable hash
aggregates over the fact table, grouped by low-cardinality feature
keys; the moment frames that feed the closing formulas are
O(categories) rows.  The two-pass z-score query broadcasts its
O(groups) moment table back across the scan.  Nothing here shuffles
measures — only partial aggregates move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hana_bq_beam_connector_spark.queries import register
from hana_bq_beam_connector_spark.queries._util import dec, rate
from hana_bq_beam_connector_spark.sources.files import load_table

# Moment sums for (x=l_extendedprice, y=l_quantity), shared by the
# correlation/regression/z-score queries.  The DuckDB text and the
# Spark expressions are kept adjacent so a reviewer can see they are
# the same arithmetic.
#
# Second moments like Σx² carry ~18 significant digits at the bench
# SF — past double's 53-bit mantissa — and engines do NOT agree on
# how an over-wide decimal rounds to double (DuckDB's hugeint path
# vs Java BigDecimal differ by ULPs; observed live at sf0.001).  So
# the exact decimal sums are ROUNDED TO INTEGERS first: an int64
# below 2^53 converts to double EXACTLY in every IEEE engine, and
# the sub-unit truncation is identical on both sides.  The closing
# formulas then cast to double explicitly and use one IEEE op per
# step on bit-identical operands.
_SQL_MOMENTS = """
    SELECT l_returnflag,
      COUNT(*) AS n,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))))
        AS BIGINT) AS sx,
      CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))))
        AS BIGINT) AS sy,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(l_quantity AS DECIMAL(18,2)))) AS BIGINT) AS sxy,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(l_extendedprice AS DECIMAL(18,2)))) AS BIGINT)
        AS sxx,
      CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))
             * CAST(l_quantity AS DECIMAL(18,2)))) AS BIGINT) AS syy
    FROM lineitem GROUP BY l_returnflag
"""

# Double views of the integer moments — the only decimal→double
# conversions in the family, all exact by the 2^53 bound.
_SQL_MOMENTS_D = f"""
    SELECT l_returnflag, n,
      CAST(n AS DOUBLE) AS nd,
      CAST(sx AS DOUBLE) AS sxd,
      CAST(sy AS DOUBLE) AS syd,
      CAST(sxy AS DOUBLE) AS sxyd,
      CAST(sxx AS DOUBLE) AS sxxd,
      CAST(syy AS DOUBLE) AS syyd
    FROM ({_SQL_MOMENTS})
"""


def _moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x, y = dec("l_extendedprice"), dec("l_quantity")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(x)).cast("bigint").alias("sx"),
        F.round(F.sum(y)).cast("bigint").alias("sy"),
        F.round(F.sum(x * y)).cast("bigint").alias("sxy"),
        F.round(F.sum(x * x)).cast("bigint").alias("sxx"),
        F.round(F.sum(y * y)).cast("bigint").alias("syy"),
    )
    return m.select(
        "l_returnflag",
        "n",
        F.col("n").cast("double").alias("nd"),
        F.col("sx").cast("double").alias("sxd"),
        F.col("sy").cast("double").alias("syd"),
        F.col("sxy").cast("double").alias("sxyd"),
        F.col("sxx").cast("double").alias("sxxd"),
        F.col("syy").cast("double").alias("syyd"),
    )


@register(
    "stat_corr_price_qty",
    f"""
    SELECT l_returnflag, n,
      (nd * sxyd - sxd * syd)
        / sqrt((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd))
        AS corr_r
    FROM ({_SQL_MOMENTS_D})
    """,
    doc="Pearson correlation between price and quantity per return "
    "flag — the feature-screening primitive.  One map-side-combined "
    "aggregate builds exact decimal moment sums (products of "
    "DECIMAL(18,2) are exact in both engines); the r formula is one "
    "textually identical IEEE expression over them, so the doubles "
    "match DuckDB bit for bit.  Never uses corr(): its streaming "
    "updates are partition-order dependent.",
)
def stat_corr_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _moments(spark, sf_dir)
    return m.select(
        "l_returnflag",
        "n",
        F.expr(
            "(nd * sxyd - sxd * syd)"
            " / sqrt((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd))"
        ).alias("corr_r"),
    )


@register(
    "stat_regr_price_on_qty",
    f"""
    SELECT l_returnflag, n,
      (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) AS slope,
      (syd - (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) * sxd)
        / nd AS intercept
    FROM ({_SQL_MOMENTS_D})
    """,
    doc="Closed-form least-squares regression of quantity on price "
    "per return flag (slope/intercept from the same exact moment "
    "sums as the correlation query — regr_slope() without the "
    "engine-specific accumulation order).  Note x is the price: the "
    "moment frame is shared, only the formula differs.",
)
def stat_regr_price_on_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _moments(spark, sf_dir)
    slope = "(nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)"
    return m.select(
        "l_returnflag",
        "n",
        F.expr(slope).alias("slope"),
        F.expr(f"(syd - {slope} * sxd) / nd").alias("intercept"),
    )


@register(
    "stat_target_encoding_priority",
    """
    WITH g AS (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS gs,
             COUNT(*) AS gn
      FROM orders
    ),
    enc AS (
      SELECT o_orderpriority,
        COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n,
      s / n AS target_mean,
      (s + 10 * (gs / gn)) / (n + 10) AS target_mean_smoothed
    FROM enc CROSS JOIN g
    """,
    doc="Target encoding of a categorical feature: per-category mean "
    "of the label (o_totalprice) plus m-estimate smoothing toward the "
    "global mean (m=10) — the standard leakage-safe encoder shape.  "
    "Two tiny aggregates (category-level and 1-row global), exact "
    "decimal sums, one IEEE division each; the 1-row global frame "
    "broadcasts via crossJoin (plan-audit allowlisted shape).",
)
def stat_target_encoding_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    g = o.agg(
        F.sum(dec("o_totalprice")).cast("double").alias("gs"),
        F.count(F.lit(1)).alias("gn"),
    )
    enc = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("o_totalprice")).cast("double").alias("s"),
    )
    return enc.crossJoin(F.broadcast(g)).select(
        "o_orderpriority",
        "n",
        F.expr("s / n").alias("target_mean"),
        F.expr("(s + 10 * (gs / gn)) / (n + 10)").alias(
            "target_mean_smoothed"
        ),
    )


@register(
    "stat_feature_hash_segment",
    """
    SELECT
      ((strpos('0123456789abcdef', substr(md5(c_mktsegment), 1, 1)) - 1)
         * 16
       + (strpos('0123456789abcdef', substr(md5(c_mktsegment), 2, 1)) - 1)
      ) % 16 AS bucket,
      COUNT(*) AS n,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal_sum
    FROM customer GROUP BY 1
    """,
    doc="The hashing trick for categorical features: md5(category) "
    "first byte mod 16 buckets — collision-tolerant fixed-width "
    "encoding with no vocabulary to ship, the standard trick when a "
    "categorical's cardinality is unbounded (crawl domains, user "
    "agents).  md5 is the cross-engine-reproducible hash (DuckDB has "
    "no xxhash64); Spark reads the first hex byte with conv(), the "
    "oracle with nibble arithmetic — same integer.",
)
def stat_feature_hash_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    bucket = (
        F.conv(F.substring(F.md5(F.col("c_mktsegment")), 1, 2), 16, 10)
        .cast("long")
        % 16
    )
    return (
        c.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("c_acctbal")).cast("double").alias("acctbal_sum"),
        )
    )


@register(
    "stat_chi2_segment_priority",
    """
    WITH cells AS (
      SELECT c.c_mktsegment, o.o_orderpriority, COUNT(*) AS obs
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    rows_ AS (SELECT c_mktsegment, SUM(obs) AS row_n FROM cells GROUP BY 1),
    cols_ AS (SELECT o_orderpriority, SUM(obs) AS col_n FROM cells GROUP BY 1),
    tot AS (SELECT SUM(obs) AS n FROM cells)
    SELECT cells.c_mktsegment, cells.o_orderpriority,
      CAST(obs AS BIGINT) AS obs,
      CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(n AS DOUBLE)
        AS expected,
      (CAST(obs AS DOUBLE)
         - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
           / CAST(n AS DOUBLE))
      * (CAST(obs AS DOUBLE)
         - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
           / CAST(n AS DOUBLE))
      / (CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)
           / CAST(n AS DOUBLE)) AS chi2_term
    FROM cells
    JOIN rows_ USING (c_mktsegment)
    JOIN cols_ USING (o_orderpriority)
    CROSS JOIN tot
    """,
    doc="Chi-square independence cells for (segment × priority): "
    "observed counts, expected under independence, per-cell χ² term.  "
    "Everything up to the last step is exact integer counts (one fact "
    "aggregate, then marginals over the O(25)-row cell frame); the "
    "per-cell doubles come from one identical IEEE expression.  The "
    "statistic itself is the SUM of chi2_term — left to the consumer "
    "because a cross-row double sum is partition-order dependent; "
    "cells are emitted so the reduction is the caller's choice.",
)
def stat_chi2_segment_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cells = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    rows_ = cells.groupBy("c_mktsegment").agg(
        F.sum("obs").alias("row_n")
    )
    cols_ = cells.groupBy("o_orderpriority").agg(
        F.sum("obs").alias("col_n")
    )
    tot = cells.agg(F.sum("obs").alias("n"))
    exp = (
        "CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE)"
        " / CAST(n AS DOUBLE)"
    )
    return (
        cells.join(F.broadcast(rows_), "c_mktsegment")
        .join(F.broadcast(cols_), "o_orderpriority")
        .crossJoin(F.broadcast(tot))
        .select(
            "c_mktsegment",
            "o_orderpriority",
            F.col("obs").cast("bigint").alias("obs"),
            F.expr(exp).alias("expected"),
            F.expr(
                f"(CAST(obs AS DOUBLE) - {exp})"
                f" * (CAST(obs AS DOUBLE) - {exp}) / ({exp})"
            ).alias("chi2_term"),
        )
    )


@register(
    "stat_zscore_outlier_gate",
    f"""
    WITH m AS ({_SQL_MOMENTS_D})
    SELECT l.l_returnflag,
      CAST(m.n AS BIGINT) AS n_total,
      CAST(COUNT(*) FILTER (WHERE
        abs(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) AS DOUBLE)
            - m.sxd / m.nd)
        > 2 * sqrt((m.nd * m.sxxd - m.sxd * m.sxd) / (m.nd * m.nd))
      ) AS BIGINT) AS n_outliers
    FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag
    GROUP BY 1, 2
    """,
    doc="Outlier gating, the data-quality filter before training: "
    "count rows beyond 2 population-σ of their group mean.  Two "
    "passes over the fact table — pass 1 reduces to O(groups) exact "
    "moments, pass 2 re-scans with the tiny moment frame BROADCAST "
    "(the fact side never shuffles).  Mean and σ are single IEEE "
    "expressions over exact sums; each row's gate compares "
    "identically derived doubles, so the boundary rows agree across "
    "engines.",
)
def stat_zscore_outlier_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    m = _moments(spark, sf_dir).select(
        "l_returnflag", "n", "nd", "sxd", "sxxd"
    )
    gate = (
        "abs(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE)"
        " - sxd / nd)"
        " > 2 * sqrt((nd * sxxd - sxd * sxd) / (nd * nd))"
    )
    return (
        li.join(F.broadcast(m), "l_returnflag")
        .groupBy("l_returnflag", F.col("n").cast("bigint").alias("n_total"))
        .agg(
            F.sum(F.when(F.expr(gate), 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers")
        )
    )


@register(
    "stat_gini_impurity_segment",
    """
    WITH cells AS (
      SELECT c.c_mktsegment, o.o_orderpriority, COUNT(*) AS cnt
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    )
    SELECT c_mktsegment,
      CAST(SUM(cnt) AS BIGINT) AS n,
      CAST(SUM(cnt) * SUM(cnt) - SUM(cnt * cnt) AS DOUBLE)
        / CAST(SUM(cnt) * SUM(cnt) AS DOUBLE) AS gini
    FROM cells GROUP BY 1
    """,
    doc="Gini impurity of the priority distribution inside each "
    "segment (split-quality score, decision-tree style).  The whole "
    "computation stays in exact integers — gini = (n² - Σc²)/n² — so "
    "there is no cross-row double sum at all; ONE final division "
    "produces the double.  Fact table aggregates once; the impurity "
    "runs on the O(segments × priorities) cell frame.",
)
def stat_gini_impurity_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cells = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return cells.groupBy("c_mktsegment").agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.expr(
            "CAST(SUM(cnt) * SUM(cnt) - SUM(cnt * cnt) AS DOUBLE)"
            " / CAST(SUM(cnt) * SUM(cnt) AS DOUBLE)"
        ).alias("gini"),
    )


@register(
    "stat_spearman_qty_discount",
    """
    WITH rx AS (
      SELECT v, 2 * (SUM(c) OVER (ORDER BY v) - c) + c + 1
               - (SUM(c) OVER () + 1) AS cr
      FROM (SELECT l_quantity AS v, COUNT(*) AS c
            FROM lineitem GROUP BY 1)
    ),
    ry AS (
      SELECT v, 2 * (SUM(c) OVER (ORDER BY v) - c) + c + 1
               - (SUM(c) OVER () + 1) AS cr
      FROM (SELECT l_discount AS v, COUNT(*) AS c
            FROM lineitem GROUP BY 1)
    ),
    m AS (
      SELECT COUNT(*) AS n,
        CAST(SUM(CAST(rx.cr AS DECIMAL(19,0))
               * CAST(ry.cr AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sxy,
        CAST(SUM(CAST(rx.cr AS DECIMAL(19,0))
               * CAST(rx.cr AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sxx,
        CAST(SUM(CAST(ry.cr AS DECIMAL(19,0))
               * CAST(ry.cr AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS syy
      FROM lineitem l
      JOIN rx ON l.l_quantity = rx.v
      JOIN ry ON l.l_discount = ry.v
    )
    SELECT n,
      CAST(sxy AS DOUBLE)
        / sqrt(CAST(sxx AS DOUBLE) * CAST(syy AS DOUBLE))
        AS spearman_rho
    FROM m
    """,
    doc="Spearman rank correlation between quantity and discount — "
    "the monotonic-association screen Pearson misses.  The 100 TB "
    "insight: ranking a LOW-CARDINALITY column needs no global sort "
    "— midranks come from a cum-count table over the DISTINCT values "
    "(≤51 rows here), broadcast back over the scan.  Midranks are "
    "kept as CENTERED INTEGERS (2·midrank − (n+1); ties get the "
    "exact doubled average rank, Σ = 0 by construction) and the "
    "three moments are EXACT DECIMAL(38,0) sums (per-row products "
    "via DECIMAL(19,0) casts; map-side combinable like any sum): "
    "|moment| ≤ n³ ≤ 10³⁸ holds to n ≈ 4.6e12 rows, three orders "
    "past a 100 TB lineitem.  The decimal→double closing cast is "
    "correctly rounded and bit-identical in both engines (verified "
    "past 2^53 and 2^63), and the final rho is ONE textually "
    "identical IEEE expression.  A raise_error guard still fires "
    "loudly past the decimal envelope in EVERY session mode — a "
    "non-ANSI cluster would otherwise return a silent NULL moment.  "
    "n comes from an unbounded window over the ≤51-row "
    "distinct-value frame, not a separate fact scan.  This replaces "
    "the r5 int64 tier whose n ≤ 2e6 guard refused to run at sf1.",
)
def stat_spearman_qty_discount(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")

    def rank_table(col: str) -> DataFrame:
        vals = li.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).alias("c")
        )
        w = Window.orderBy("v").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        w_all = Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        return vals.select(
            "v",
            (
                2 * (F.sum("c").over(w) - F.col("c"))
                + F.col("c")
                + 1
                - (F.sum("c").over(w_all) + 1)
            ).alias("cr"),
            F.count(F.lit(1)).over(w_all).alias("nd"),
        )

    rx = rank_table("l_quantity").select(
        F.col("v").alias("vx"),
        F.col("cr").alias("crx"),
        F.col("nd").alias("ndx"),
    )
    ry = rank_table("l_discount").select(
        F.col("v").alias("vy"),
        F.col("cr").alias("cry"),
        F.col("nd").alias("ndy"),
    )
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    m = (
        li.join(F.broadcast(rx), li["l_quantity"] == rx["vx"])
        .join(F.broadcast(ry), li["l_discount"] == ry["vy"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("ndx").alias("ndx"),
            F.max("ndy").alias("ndy"),
            F.sum(dec("crx") * dec("cry"))
            .cast("decimal(38,0)")
            .alias("sxy"),
            F.sum(dec("crx") * dec("crx"))
            .cast("decimal(38,0)")
            .alias("sxx"),
            F.sum(dec("cry") * dec("cry"))
            .cast("decimal(38,0)")
            .alias("syy"),
        )
    )
    # Every-mode scale guards: past n ~ 4.6e12 the DECIMAL(38,0)
    # moments exceed their exactness bound (|moment| <= n^3 <= 10^38)
    # — ANSI raises on the sum, but a non-ANSI session would return a
    # silent NULL.  And the whole formulation PREMISES low cardinality:
    # the cum-count rank table runs through a single-task unpartitioned
    # window, so a high-cardinality column would silently funnel its
    # distinct frame through one task — refuse loudly at 1e4 distinct
    # values instead.  raise_error fires regardless of session mode; at
    # every realistic SF neither branch is taken, so the oracle
    # comparison is unaffected.
    rho = (
        "CAST(sxy AS DOUBLE)"
        " / sqrt(CAST(sxx AS DOUBLE) * CAST(syy AS DOUBLE))"
    )
    return m.select(
        "n",
        F.expr(
            "CASE WHEN ndx > 10000 OR ndy > 10000 THEN raise_error("
            "'stat_spearman_qty_discount: the rank-factorization "
            "formulation needs <= 1e4 DISTINCT values per column "
            "(single-task cum-count window); quantize the column into "
            "bands or shard by group before ranking') "
            "WHEN n > 4600000000000 THEN raise_error("
            "'stat_spearman_qty_discount: exact DECIMAL(38,0) rank "
            "moments need n <= ~4.6e12 rows (|moment| <= n^3); shard "
            "by group, sample, or quantize ranks before going wider') "
            f"ELSE {rho} END"
        ).alias("spearman_rho"),
    )


@register(
    "stat_covar_discount_tax",
    """
    SELECT l_linestatus,
      COUNT(*) AS n,
      (CAST(SUM(CAST(l_discount AS DECIMAL(4,3))
              * CAST(l_tax AS DECIMAL(4,3))) AS DOUBLE)
       - CAST(SUM(CAST(l_discount AS DECIMAL(4,3))) AS DOUBLE)
         * CAST(SUM(CAST(l_tax AS DECIMAL(4,3))) AS DOUBLE) / n)
      / (n - 1) AS covar_samp
    FROM lineitem GROUP BY l_linestatus
    """,
    doc="Sample covariance between discount and tax per line status "
    "— the redundancy screen for near-duplicate features.  Rates are "
    "exact DECIMAL(4,3); their products DECIMAL(8,6) — exact sums in "
    "both engines, one identical IEEE closing expression "
    "(Σxy − ΣxΣy/n)/(n−1).  Single map-side-combined aggregate.",
)
def stat_covar_discount_tax(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    d, t = rate("l_discount"), rate("l_tax")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(d * t).cast("double").alias("sxy"),
            F.sum(d).cast("double").alias("sx"),
            F.sum(t).cast("double").alias("sy"),
        )
        .select(
            "l_linestatus",
            "n",
            F.expr("(sxy - sx * sy / n) / (n - 1)").alias("covar_samp"),
        )
    )


# Deterministic half-sample bootstrap: B balanced pseudo-replicas via
# an md5-mixed membership bit (no RNG — reproducible on any layout /
# engine / rerun).  NOT a multiplicative hash: a Knuth-hash membership
# over near-sequential keys is a phase-shifted Weyl sequence — every
# "half" is unnaturally representative (observed: exactly 7500/15000
# members), the replica means barely spread, and the CI collapses.
# md5 decorrelates the replicas properly; both engines have it.
_BOOT_B = 16


def _boot_member_sql(dialect: str) -> str:
    """Membership predicate: first byte of md5('<key>:<replica>')
    < 128 — a fair coin per (key, replica) pair, identical in both
    engines (same string in, same digest out)."""
    if dialect == "spark":
        return (
            "CAST(conv(substring(md5(concat(cast(o_orderkey as string),"
            " ':', cast(b as string))), 1, 2), 16, 10) AS INT) < 128"
        )
    hx = (
        "md5(concat(CAST(o_orderkey AS VARCHAR), ':',"
        " CAST(b AS VARCHAR)))"
    )
    nib1 = f"(strpos('0123456789abcdef', substr({hx}, 1, 1)) - 1)"
    nib2 = f"(strpos('0123456789abcdef', substr({hx}, 2, 1)) - 1)"
    return f"({nib1} * 16 + {nib2}) < 128"


@register(
    "stat_halfsample_replica_means",
    f"""
    WITH r AS (SELECT unnest(range(0, {_BOOT_B})) AS b),
    reps AS (
      SELECT r.b, o.o_orderkey, o.o_totalprice
      FROM orders o CROSS JOIN r
    )
    SELECT CAST(b AS BIGINT) AS replica,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        / COUNT(*) AS mean_price
    FROM reps WHERE {_boot_member_sql('duckdb')}
    GROUP BY 1
    """,
    doc="Uncertainty quantification without RNG: B=16 deterministic "
    "half-sample pseudo-replicas of the order population (membership "
    "= first md5 byte of '<orderkey>:<replica>' — a fair, "
    "replica-decorrelated coin that replays identically across "
    "engines, layouts and reruns; a multiplicative hash is NOT used "
    "because over near-sequential keys it yields phase-shifted Weyl "
    "halves that are unnaturally representative and collapse the "
    "CI), each replica emitting its exact-decimal mean; the spread "
    "of replica means IS the bootstrap-CI machinery, left to the "
    "consumer per the cross-row-double rule.  Scale: ONE fact scan "
    "with an in-row 16-way fan-out (explode of a literal array); the "
    "partial aggregate reduces every partition to <= B rows before "
    "the only exchange, so shuffle volume is O(B x partitions), "
    "independent of the 16x row fan-out.",
)
def stat_halfsample_replica_means(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    reps = o.select(
        "o_orderkey",
        "o_totalprice",
        F.explode(
            F.array(*[F.lit(b) for b in range(_BOOT_B)])
        ).alias("b"),
    ).where(F.expr(_boot_member_sql("spark")))
    return reps.groupBy(F.col("b").cast("bigint").alias("replica")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        (
            F.sum(dec("o_totalprice")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_price"),
    )


@register(
    "stat_mannwhitney_u",
    """
    WITH vc AS (
      SELECT l_quantity AS v, COUNT(*) AS c,
             SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS c1
      FROM lineitem GROUP BY 1
    ),
    r AS (
      SELECT v, c, c1,
        2 * (SUM(c) OVER (ORDER BY v) - c) + c + 1 AS cr2
      FROM vc
    ),
    m AS (
      SELECT
        CAST(SUM(c1) AS BIGINT) AS n1,
        CAST(SUM(c - c1) AS BIGINT) AS n2,
        CAST(SUM(CAST(c1 AS DECIMAL(19,0))
               * CAST(cr2 AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS r1_2,
        CAST(SUM(CAST(c AS DECIMAL(12,0)) * CAST(c AS DECIMAL(12,0))
               * CAST(c AS DECIMAL(12,0)) - c) AS DECIMAL(38,0)) AS tsum
      FROM r
    ),
    u AS (
      SELECT n1, n2,
        CAST(r1_2 - CAST(n1 AS DECIMAL(19,0)) * (n1 + 1)
             AS DECIMAL(38,0)) AS u1_2,
        tsum
      FROM m
    )
    SELECT n1, n2,
      CAST(u1_2 AS DOUBLE) / 2 AS u1,
      (CAST(u1_2 AS DOUBLE) / 2
        - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2)
      / SQRT(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12
        * (CAST(n1 + n2 AS DOUBLE) + 1
           - CAST(tsum AS DOUBLE)
             / (CAST(n1 + n2 AS DOUBLE)
                * (CAST(n1 + n2 AS DOUBLE) - 1)))) AS z_stat
    FROM u
    """,
    doc="Mann-Whitney U (Wilcoxon rank-sum) between the two "
    "l_linestatus populations' quantity distributions — the "
    "nonparametric two-sample location test, with the EXACT "
    "tie-corrected normal approximation.  Same 100 TB insight as "
    "Spearman: ranking a low-cardinality column needs NO global sort "
    "and NO rank-rejoin to the fact rows — the rank sum factors as "
    "Σ c1(v)·midrank2(v) over the ≤51-row distinct-value table, so "
    "after one map-side-combinable groupBy the whole statistic "
    "reduces over ~51 rows.  Midranks are centered DOUBLED integers; "
    "rank sums and the tie term Σ(c³−c) are exact DECIMAL(38,0) "
    "(envelope n ≈ 1e12, loudly guarded); U and the z statistic are "
    "ONE textually identical closing IEEE expression per column.",
)
def stat_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    vc = li.groupBy(F.col("l_quantity").alias("v")).agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(
            F.when(F.col("l_linestatus") == "O", 1).otherwise(0)
        ).alias("c1"),
    )
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = vc.select(
        "v",
        "c",
        "c1",
        (2 * (F.sum("c").over(w) - F.col("c")) + F.col("c") + 1).alias(
            "cr2"
        ),
    )
    d12 = lambda col: F.col(col).cast("decimal(12,0)")  # noqa: E731
    m = r.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum(F.col("c") - F.col("c1")).cast("bigint").alias("n2"),
        F.count(F.lit(1)).cast("bigint").alias("nd"),
        F.sum(
            F.col("c1").cast("decimal(19,0)")
            * F.col("cr2").cast("decimal(19,0)")
        )
        .cast("decimal(38,0)")
        .alias("r1_2"),
        F.sum(d12("c") * d12("c") * d12("c") - F.col("c"))
        .cast("decimal(38,0)")
        .alias("tsum"),
    )
    u = m.select(
        "n1",
        "n2",
        "nd",
        (
            F.col("r1_2")
            - F.col("n1").cast("decimal(19,0)") * (F.col("n1") + 1)
        )
        .cast("decimal(38,0)")
        .alias("u1_2"),
        "tsum",
    )
    z = (
        "(CAST(u1_2 AS DOUBLE) / 2"
        " - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2)"
        " / SQRT(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12"
        " * (CAST(n1 + n2 AS DOUBLE) + 1"
        " - CAST(tsum AS DOUBLE)"
        " / (CAST(n1 + n2 AS DOUBLE)"
        " * (CAST(n1 + n2 AS DOUBLE) - 1))))"
    )
    # Loud envelope guards: decimal exactness (n^3 within DECIMAL(36),
    # past ~1e12 rows shard by group before ranking) AND the
    # low-cardinality premise (the cum-count window is single-task —
    # refuse past 1e4 distinct values instead of silently funneling
    # the distinct frame through one task).
    guarded_z = (
        "CASE WHEN nd > 10000 THEN raise_error("
        "'stat_mannwhitney_u: the rank-factorization formulation "
        "needs <= 1e4 DISTINCT values (single-task cum-count window); "
        "quantize into bands or shard by group before ranking') "
        "WHEN n1 + n2 >= 1000000000000 THEN raise_error("
        "'stat_mannwhitney_u: exact decimal rank moments need "
        "n <= ~1e12 rows; shard by group before ranking') "
        f"ELSE {z} END"
    )
    return u.select(
        "n1",
        "n2",
        F.expr("CAST(u1_2 AS DOUBLE) / 2").alias("u1"),
        F.expr(guarded_z).alias("z_stat"),
    )


@register(
    "stat_gini_coefficient_qty",
    """
    WITH vc AS (
      SELECT CAST(l_quantity AS BIGINT) AS v, COUNT(*) AS c
      FROM lineitem GROUP BY 1
    ),
    r AS (
      SELECT v, c,
        2 * (SUM(c) OVER (ORDER BY v) - c) + c + 1 AS cr2
      FROM vc
    ),
    m AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n,
        CAST(SUM(CAST(v AS DECIMAL(19,0)) * c) AS DECIMAL(38,0)) AS sx,
        CAST(SUM(CAST(v AS DECIMAL(12,0)) * CAST(c AS DECIMAL(12,0))
               * CAST(cr2 AS DECIMAL(13,0))) AS DECIMAL(38,0)) AS sxr2
      FROM r
    )
    SELECT n,
      CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_qty,
      CAST(sxr2 AS DOUBLE)
        / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
        - (CAST(n AS DOUBLE) + 1) / CAST(n AS DOUBLE) AS gini
    FROM m
    """,
    doc="Exact Gini coefficient of the quantity distribution — the "
    "inequality / concentration measure (0 = uniform, ->1 = one row "
    "holds everything) data-balance audits report per source or "
    "segment.  THIRD reuse of the low-cardinality rank insight "
    "(Spearman, Mann-Whitney, now Gini): G = Σ x·midrank / (n·Σx) "
    "- (n+1)/n needs the values SORTED, but sorting a 100 TB column "
    "is unnecessary when ranks factor over the ≤51-row "
    "distinct-value table — Σ_i x_i·rank_i = Σ_v v·c_v·midrank_v "
    "with doubled midranks keeping every term an exact integer.  "
    "Moments are DECIMAL(38,0) (v ≤ 1e12, c ≤ 1e12, cr2 ≤ 2e12 "
    "within the (12,0)x(12,0)x(13,0)->(38,0) product envelope); the "
    "closing G is ONE textually identical IEEE expression.  "
    "l_quantity is integral by construction; the BIGINT cast is "
    "exact and identical both engines.",
)
def stat_gini_coefficient_qty(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    vc = li.groupBy(
        F.col("l_quantity").cast("bigint").alias("v")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = vc.select(
        "v",
        "c",
        (2 * (F.sum("c").over(w) - F.col("c")) + F.col("c") + 1).alias(
            "cr2"
        ),
    )
    m = r.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.max("v").cast("bigint").alias("max_v"),
        F.count(F.lit(1)).cast("bigint").alias("nd"),
        F.sum(F.col("v").cast("decimal(19,0)") * F.col("c"))
        .cast("decimal(38,0)")
        .alias("sx"),
        F.sum(
            F.col("v").cast("decimal(12,0)")
            * F.col("c").cast("decimal(12,0)")
            * F.col("cr2").cast("decimal(13,0)")
        )
        .cast("decimal(38,0)")
        .alias("sxr2"),
    )
    # Every-session-mode envelope guard (sibling of the Spearman /
    # Mann-Whitney guards): past the DECIMAL(12,0) cast capacity a
    # non-ANSI session would NULL a product term and sum a silently
    # wrong Gini.  c <= n and cr2 <= 2n+1 are covered by the n bound;
    # v is a DATA value, so it gets its own bound.
    gini = (
        "CAST(sxr2 AS DOUBLE)"
        " / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))"
        " - (CAST(n AS DOUBLE) + 1) / CAST(n AS DOUBLE)"
    )
    guarded = (
        "CASE WHEN nd > 10000 THEN raise_error("
        "'stat_gini_coefficient_qty: the rank-factorization "
        "formulation needs <= 1e4 DISTINCT values (single-task "
        "cum-count window); quantize into bands or shard by group "
        "before ranking') "
        "WHEN n >= 1000000000000 OR max_v >= 1000000000000 THEN "
        "raise_error('stat_gini_coefficient_qty: exact decimal rank "
        "moments need n < 1e12 rows and values < 1e12; shard by "
        "group or rescale the measure before going wider') "
        f"ELSE {gini} END"
    )
    return m.select(
        "n",
        F.expr("CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)").alias(
            "mean_qty"
        ),
        F.expr(guarded).alias("gini"),
    )
