"""Distribution-drift / dataset-monitoring queries (SURVEY §2c drift
[X] — NEW group, round 5).

The monitoring layer a production training pipeline runs between
snapshot refreshes: "did the data that arrived this week still look
like the data the model was trained on?"  Two snapshots are compared
throughout — orders with ``year(o_orderdate) <= 1997`` (snapshot A,
the training corpus) vs later orders (snapshot B, the refresh).  The
reference has none of this (its 439 LoC copy rows verbatim); every
query here is an engine extension.

Determinism doctrine, applied to drift measures: the industry PSI
uses ln(), which is NOT cross-engine reproducible (same stance as
text_tfidf_topk's rational idf) — so the drift measures here are the
transcendental-free ones: total-variation distance and the KS
statistic stay in exact BIGINT numerators (|c_a*n_b - c_b*n_a|) with
ONE closing IEEE division, chi-square homogeneity follows
stat_chi2_segment_priority's exact-count/expected shape, decile
shifts are raw data values passed through untouched, and churn is
pure integers.  Where a BIGINT numerator could exceed 2^53 (exact
double conversion bound) — n_a*n_b > 2^53 for KS (~9.5e7 rows/side
symmetric), > 2^52 for the summed TVD (~6.7e7) — a raise_error guard
fires in EVERY session mode (the Spearman precedent) and names the
unbounded alternative; the guard is the overflow-free division form
wrapped around the numerator expression itself, so the NAMED error
always preempts a generic ANSI ARITHMETIC_OVERFLOW and asymmetric
snapshots with tiny products never false-trip.

Scale: every query reduces the fact scan to an O(bands | categories |
customers) frame in one map-side-combinable aggregate; windows and
reshaping run on those tiny frames only.  The churn and user-overlap
queries' distinct-key aggregates are the one O(keys) shuffle — the
same cost as any distinct count.  The streaming face of this family
is ``stream_drift_baseline`` (queries/streaming.py): the same
per-cell share-vs-baseline emission over tumbling event-time windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hana_bq_beam_connector_spark.queries import register
from hana_bq_beam_connector_spark.sources.files import load_table

# Snapshot split predicate — year() sidesteps timestamp-literal
# layout drift entirely (works identically on NTZ/LTZ/parquet TS).
_IN_A = "EXTRACT(year FROM o_orderdate) <= 1997"

# Exact-double envelopes for the integer drift numerators.  The KS
# statistic casts a single |cum*n| <= n_a*n_b product; the TVD casts
# the SUMMED numerator, bounded by 2*n_a*n_b — so TVD's product bound
# is one bit tighter.  The guard test is the overflow-free division
# form ``n_b > bound DIV greatest(n_a, 1)`` (equivalent to
# n_a*n_b > bound for POSITIVE n_a — it can never itself
# ANSI-overflow, and it does NOT false-trip on asymmetric snapshots
# like n_a=1e10/n_b=100 whose products are still tiny; the one
# divergence is the degenerate n_a=0 snapshot past the bound
# itself (~4.5e15 rows for TVD's 2^52, ~9.0e15 for KS's 2^53),
# where it raises although every numerator is exactly 0 — acceptable
# because an empty side makes the statistic 0/0=NaN anyway).  The guard
# wraps the NUMERATOR expression — inside the aggregate for TVD,
# inside the per-band projection for KS — so it evaluates BEFORE the
# int64 arithmetic it protects: in ANSI mode the named raise_error
# fires first instead of a generic ARITHMETIC_OVERFLOW from the sum.
_PROD_GUARD_KS = 2**53  # ks_num <= n_a*n_b
_PROD_GUARD_TVD = 2**52  # tvd_num <= 2*n_a*n_b

# Shared snapshot x price-band cell frame (SQL text; the Spark twin
# is _price_cells below).  SUM(CASE) casts to BIGINT (DuckDB sums to
# HUGEINT, which the comparator cannot represent).
def _sql_cells(width: int) -> str:
    return f"""
      SELECT CAST(FLOOR(o_totalprice / {width}) AS BIGINT) AS band,
        CAST(SUM(CASE WHEN {_IN_A} THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
        CAST(SUM(CASE WHEN {_IN_A} THEN 0 ELSE 1 END) AS BIGINT) AS c_b
      FROM orders GROUP BY 1
    """


def _price_cells(
    spark: SparkSession, sf_dir: str, width: int
) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    in_a = F.year("o_orderdate") <= 1997
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / width)
            .cast("bigint")
            .alias("band")
        )
        .agg(
            F.sum(F.when(in_a, 1).otherwise(0))
            .cast("bigint")
            .alias("c_a"),
            F.sum(F.when(in_a, 0).otherwise(1))
            .cast("bigint")
            .alias("c_b"),
        )
    )


@register(
    "drift_tvd_price_bands",
    f"""
    WITH b AS ({_sql_cells(25000)}),
    t AS (SELECT CAST(SUM(c_a) AS BIGINT) AS n_a,
                 CAST(SUM(c_b) AS BIGINT) AS n_b FROM b)
    SELECT band, c_a, c_b,
      CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p_a,
      CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p_b,
      ABS(CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
          - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE)) AS abs_diff
    FROM b CROSS JOIN t
    """,
    doc="Per-band drift profile of the price distribution between "
    "the training snapshot (orders through 1997) and the refresh "
    "(1998+): counts, proportions, and |p_a - p_b| per equi-width "
    "band.  The per-band ratios are single IEEE divisions of exact "
    "integer operands, so this emission stays deterministic at ANY "
    "scale — it is the unbounded path the guarded global TVD query "
    "points to.  One fact aggregate to an O(bands) frame; the 1-row "
    "totals broadcast via crossJoin (plan-audit allowlisted shape).",
)
def drift_tvd_price_bands(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    b = _price_cells(spark, sf_dir, 25000)
    t = b.agg(
        F.sum("c_a").cast("bigint").alias("n_a"),
        F.sum("c_b").cast("bigint").alias("n_b"),
    )
    diff = (
        "ABS(CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)"
        " - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
    )
    return b.crossJoin(F.broadcast(t)).select(
        "band",
        "c_a",
        "c_b",
        F.expr("CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)").alias("p_a"),
        F.expr("CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE)").alias("p_b"),
        F.expr(diff).alias("abs_diff"),
    )


@register(
    "drift_tvd_total",
    f"""
    WITH b AS ({_sql_cells(25000)}),
    c AS (
      SELECT c_a, c_b,
        CAST(SUM(c_a) OVER () AS BIGINT) AS n_a,
        CAST(SUM(c_b) OVER () AS BIGINT) AS n_b
      FROM b
    )
    SELECT n_a, n_b,
      CAST(COUNT(*) AS BIGINT) AS n_bands,
      CAST(CAST(SUM(ABS(c_a * n_b - c_b * n_a)) AS BIGINT) AS DOUBLE)
        / (2 * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS tvd
    FROM c GROUP BY n_a, n_b
    """,
    doc="Global total-variation distance between the two snapshot "
    "price distributions: TVD = Sum|c_a*n_b - c_b*n_a| / (2*n_a*n_b) "
    "— every numerator an exact BIGINT (no per-band double sum, "
    "whose accumulation order engines disagree on), ONE closing IEEE "
    "division.  Exactness bound: the SUMMED numerator is <= "
    "2*n_a*n_b, so the exact-cast envelope is n_a*n_b <= 2^52 (one "
    "bit tighter than the per-band bound) — past it a raise_error "
    "guard fires in EVERY session mode and names "
    "drift_tvd_price_bands (pure per-band ratios) as the unbounded "
    "path.  Runs on the O(bands) cell frame; the fact table is "
    "scanned once.",
)
def drift_tvd_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _price_cells(spark, sf_dir, 25000)
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cells = b.select(
        "c_a",
        "c_b",
        F.sum("c_a").over(w_all).cast("bigint").alias("n_a"),
        F.sum("c_b").over(w_all).cast("bigint").alias("n_b"),
    )
    # The guard lives INSIDE the sum so it evaluates before any
    # per-band product: if it passes, every |c*n| <= n_a*n_b <= 2^52
    # and the sum <= 2^53 — no int64 step can overflow in any mode.
    guarded_num = F.expr(
        f"CASE WHEN n_b > {_PROD_GUARD_TVD} DIV greatest(n_a, 1) THEN "
        "raise_error('drift_tvd_total: the summed TVD numerator "
        "(<= 2*n_a*n_b) needs n_a*n_b <= 2^52 for an exact "
        "BIGINT->DOUBLE cast; use drift_tvd_price_bands per-band "
        "ratios at larger scale') "
        "ELSE ABS(c_a * n_b - c_b * n_a) END"
    )
    t = cells.groupBy("n_a", "n_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bands"),
        F.sum(guarded_num).cast("bigint").alias("tvd_num"),
    )
    return t.select(
        "n_a",
        "n_b",
        "n_bands",
        F.expr(
            "CAST(tvd_num AS DOUBLE)"
            " / (2 * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))"
        ).alias("tvd"),
    )


@register(
    "drift_ks_price",
    f"""
    WITH b AS ({_sql_cells(1000)}),
    cum AS (
      SELECT band,
        CAST(SUM(c_a) OVER (ORDER BY band) AS BIGINT) AS cum_a,
        CAST(SUM(c_b) OVER (ORDER BY band) AS BIGINT) AS cum_b,
        CAST(SUM(c_a) OVER () AS BIGINT) AS n_a,
        CAST(SUM(c_b) OVER () AS BIGINT) AS n_b
      FROM b
    )
    SELECT band AS ks_band, cum_a, cum_b, n_a, n_b,
      CAST(ABS(cum_a * n_b - cum_b * n_a) AS BIGINT) AS ks_num,
      CAST(ABS(cum_a * n_b - cum_b * n_a) AS DOUBLE)
        / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS ks
    FROM cum
    ORDER BY ks_num DESC, band
    LIMIT 1
    """,
    doc="Kolmogorov-Smirnov distance between the snapshot price "
    "distributions, on a fixed 1000-wide band grid (binned ECDFs — "
    "the 100 TB formulation: the cumulative window runs over the "
    "O(bands) frame, never a global sort of raw rows).  "
    "KS = max_band |cumA*nB - cumB*nA| / (nA*nB): the argmax is "
    "taken over exact BIGINT numerators (deterministic, ties broken "
    "on band), with ONE closing IEEE division; past n_a*n_b > 2^53 "
    "the exact-cast envelope breaks and the same every-session-mode "
    "raise_error guard as drift_tvd_total fires, naming the per-band "
    "proportion fallback.",
)
def drift_ks_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _price_cells(spark, sf_dir, 1000)
    w_cum = Window.orderBy("band").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = b.select(
        F.col("band").alias("ks_band"),
        F.sum("c_a").over(w_cum).cast("bigint").alias("cum_a"),
        F.sum("c_b").over(w_cum).cast("bigint").alias("cum_b"),
        F.sum("c_a").over(w_all).cast("bigint").alias("n_a"),
        F.sum("c_b").over(w_all).cast("bigint").alias("n_b"),
    )
    # Guard wraps ks_num itself (the first expression to touch a
    # cum*n product) so the named error preempts any ANSI overflow.
    guarded_num = (
        f"CASE WHEN n_b > {_PROD_GUARD_KS} DIV greatest(n_a, 1) THEN "
        "raise_error('drift_ks_price: the ECDF numerator "
        "(<= n_a*n_b) needs n_a*n_b <= 2^53 for an exact "
        "BIGINT->DOUBLE cast; quantize to proportions per "
        "band or sample before going wider') "
        "ELSE CAST(ABS(cum_a * n_b - cum_b * n_a) AS BIGINT) END"
    )
    return (
        cum.select(
            "ks_band",
            "cum_a",
            "cum_b",
            "n_a",
            "n_b",
            F.expr(guarded_num).alias("ks_num"),
        )
        .select(
            "*",
            F.expr(
                "CAST(ks_num AS DOUBLE)"
                " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))"
            ).alias("ks"),
        )
        .orderBy(F.col("ks_num").desc(), "ks_band")
        .limit(1)
    )


@register(
    "drift_chi2_priority_homogeneity",
    f"""
    WITH cells AS (
      SELECT o_orderpriority,
        CAST(SUM(CASE WHEN {_IN_A} THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
        CAST(SUM(CASE WHEN {_IN_A} THEN 0 ELSE 1 END) AS BIGINT) AS c_b
      FROM orders GROUP BY 1
    ),
    t AS (SELECT CAST(SUM(c_a) AS BIGINT) AS n_a,
                 CAST(SUM(c_b) AS BIGINT) AS n_b FROM cells)
    SELECT o_orderpriority, c_a, c_b,
      CAST(c_a + c_b AS DOUBLE) * CAST(n_a AS DOUBLE)
        / CAST(n_a + n_b AS DOUBLE) AS expected_a,
      (CAST(c_a AS DOUBLE) - CAST(c_a + c_b AS DOUBLE)
         * CAST(n_a AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
      * (CAST(c_a AS DOUBLE) - CAST(c_a + c_b AS DOUBLE)
         * CAST(n_a AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
      / (CAST(c_a + c_b AS DOUBLE) * CAST(n_a AS DOUBLE)
         / CAST(n_a + n_b AS DOUBLE))
      + (CAST(c_b AS DOUBLE) - CAST(c_a + c_b AS DOUBLE)
         * CAST(n_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
      * (CAST(c_b AS DOUBLE) - CAST(c_a + c_b AS DOUBLE)
         * CAST(n_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
      / (CAST(c_a + c_b AS DOUBLE) * CAST(n_b AS DOUBLE)
         / CAST(n_a + n_b AS DOUBLE)) AS chi2_term
    FROM cells CROSS JOIN t
    """,
    doc="Chi-square homogeneity cells between the two snapshots over "
    "order priority (the categorical drift test: is the class mix "
    "stable over time?).  Same shape discipline as "
    "stat_chi2_segment_priority: everything up to the last step is "
    "exact integer counts; expected counts and per-category terms "
    "are one textually identical IEEE expression; the statistic is "
    "the SUM of chi2_term, left to the consumer because a cross-row "
    "double sum is partition-order dependent.  One fact aggregate to "
    "an O(priorities) frame; 1-row totals broadcast (allowlisted).",
)
def drift_chi2_priority_homogeneity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    in_a = F.year("o_orderdate") <= 1997
    cells = o.groupBy("o_orderpriority").agg(
        F.sum(F.when(in_a, 1).otherwise(0)).cast("bigint").alias("c_a"),
        F.sum(F.when(in_a, 0).otherwise(1)).cast("bigint").alias("c_b"),
    )
    t = cells.agg(
        F.sum("c_a").cast("bigint").alias("n_a"),
        F.sum("c_b").cast("bigint").alias("n_b"),
    )

    def exp(side: str) -> str:
        return (
            "CAST(c_a + c_b AS DOUBLE)"
            f" * CAST(n_{side} AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)"
        )

    def term(side: str) -> str:
        return (
            f"(CAST(c_{side} AS DOUBLE) - {exp(side)})"
            f" * (CAST(c_{side} AS DOUBLE) - {exp(side)})"
            f" / ({exp(side)})"
        )

    return cells.crossJoin(F.broadcast(t)).select(
        "o_orderpriority",
        "c_a",
        "c_b",
        F.expr(exp("a")).alias("expected_a"),
        F.expr(f"{term('a')} + {term('b')}").alias("chi2_term"),
    )


@register(
    "drift_customer_churn",
    f"""
    WITH g AS (
      SELECT o_custkey,
        MAX(CASE WHEN {_IN_A} THEN 1 ELSE 0 END) AS has_a,
        MAX(CASE WHEN {_IN_A} THEN 0 ELSE 1 END) AS has_b
      FROM orders GROUP BY 1
    )
    SELECT
      CASE WHEN has_b = 0 THEN 'churned'
           WHEN has_a = 0 THEN 'new'
           ELSE 'retained' END AS status,
      CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM g GROUP BY 1
    """,
    doc="Entity churn between snapshots: customers active through "
    "1997 vs 1998+, classified churned / new / retained.  Pure "
    "integer counts — no float anywhere.  Scale: the family's "
    "CASE-split doctrine applied to membership — ONE scan reduces to "
    "per-customer (has_a, has_b) presence flags (MAX is partial-agg "
    "combinable), so the single key exchange replaces the naive "
    "shape's two filtered scans + two distincts + full outer join; "
    "the status classification runs on the O(customers) flag frame.",
)
def drift_customer_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    in_a = F.year("o_orderdate") <= 1997
    g = o.groupBy("o_custkey").agg(
        F.max(F.when(in_a, 1).otherwise(0)).alias("has_a"),
        F.max(F.when(in_a, 0).otherwise(1)).alias("has_b"),
    )
    status = (
        F.when(F.col("has_b") == 0, "churned")
        .when(F.col("has_a") == 0, "new")
        .otherwise("retained")
    )
    return g.groupBy(status.alias("status")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers")
    )


@register(
    "drift_decile_shift_price",
    f"""
    WITH r AS (
      SELECT CASE WHEN {_IN_A} THEN 'a' ELSE 'b' END AS snap,
             o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY CASE WHEN {_IN_A} THEN 'a' ELSE 'b' END
               ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (
               PARTITION BY CASE WHEN {_IN_A} THEN 'a' ELSE 'b' END) AS n
      FROM orders
    ),
    q AS (
      SELECT snap,
        MIN(CASE WHEN rn = CAST(FLOOR((1 * n + 9) / 10) AS BIGINT)
                 THEN o_totalprice END) AS d1,
        MIN(CASE WHEN rn = CAST(FLOOR((2 * n + 9) / 10) AS BIGINT)
                 THEN o_totalprice END) AS d2,
        MIN(CASE WHEN rn = CAST(FLOOR((3 * n + 9) / 10) AS BIGINT)
                 THEN o_totalprice END) AS d3,
        MIN(CASE WHEN rn = CAST(FLOOR((4 * n + 9) / 10) AS BIGINT)
                 THEN o_totalprice END) AS d4,
        MIN(CASE WHEN rn = CAST(FLOOR((5 * n + 9) / 10) AS BIGINT)
                 THEN o_totalprice END) AS d5,
        MIN(CASE WHEN rn = CAST(FLOOR((6 * n + 9) / 10) AS BIGINT)
                 THEN o_totalprice END) AS d6,
        MIN(CASE WHEN rn = CAST(FLOOR((7 * n + 9) / 10) AS BIGINT)
                 THEN o_totalprice END) AS d7,
        MIN(CASE WHEN rn = CAST(FLOOR((8 * n + 9) / 10) AS BIGINT)
                 THEN o_totalprice END) AS d8,
        MIN(CASE WHEN rn = CAST(FLOOR((9 * n + 9) / 10) AS BIGINT)
                 THEN o_totalprice END) AS d9
      FROM r GROUP BY snap
    ),
    u AS (
      SELECT snap, 1 AS decile, d1 AS q_val FROM q
      UNION ALL SELECT snap, 2, d2 FROM q
      UNION ALL SELECT snap, 3, d3 FROM q
      UNION ALL SELECT snap, 4, d4 FROM q
      UNION ALL SELECT snap, 5, d5 FROM q
      UNION ALL SELECT snap, 6, d6 FROM q
      UNION ALL SELECT snap, 7, d7 FROM q
      UNION ALL SELECT snap, 8, d8 FROM q
      UNION ALL SELECT snap, 9, d9 FROM q
    )
    SELECT decile,
      MIN(CASE WHEN snap = 'a' THEN q_val END) AS q_a,
      MIN(CASE WHEN snap = 'b' THEN q_val END) AS q_b,
      MIN(CASE WHEN snap = 'b' THEN q_val END)
        - MIN(CASE WHEN snap = 'a' THEN q_val END) AS shift
    FROM u GROUP BY decile
    """,
    doc="Quantile drift: exact nearest-rank deciles of price per "
    "snapshot, aligned by decile, with the shift q_b - q_a.  Decile "
    "values are raw data values passed through untouched "
    "(agg_percentiles_exact_nearest_rank's convention) and the shift "
    "is ONE IEEE subtraction of them.  The ranked window runs once "
    "over the fact scan partitioned by snapshot; the unpivot/pivot "
    "reshaping touches only the 2-row decile frame.  At 100 TB the "
    "per-snapshot global sort is the cost — swap the rank source for "
    "the GK-sketch bands (agg_approx_percentiles) when "
    "convention-exact deciles aren't required.",
)
def drift_decile_shift_price(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    snap = F.when(F.year("o_orderdate") <= 1997, "a").otherwise("b")
    w = Window.partitionBy("snap").orderBy("o_totalprice", "o_orderkey")
    w_all = Window.partitionBy("snap")
    r = o.select(
        snap.alias("snap"),
        "o_totalprice",
        "o_orderkey",
    ).select(
        "snap",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )

    def at(k: int):
        # Nearest-rank index ceil(k*n/10) in INTEGER form
        # floor((k*n+9)/10): k*n+9 is exact as a double well past any
        # realistic n, /10 is one correctly-rounded IEEE division
        # (exact whenever the true quotient is an integer), so both
        # engines agree — unlike a 0.1*n literal, which parses as
        # decimal in DuckDB but double in Spark.
        idx = F.floor((F.lit(k) * F.col("n") + 9) / 10).cast("bigint")
        return F.min(
            F.when(F.col("rn") == idx, F.col("o_totalprice"))
        ).alias(f"d{k}")

    q = r.groupBy("snap").agg(*[at(k) for k in range(1, 10)])
    u = q.select(
        "snap",
        F.expr(
            "stack(9, "
            + ", ".join(f"{k}, d{k}" for k in range(1, 10))
            + ") AS (decile, q_val)"
        ),
    )
    return u.groupBy("decile").agg(
        F.min(F.when(F.col("snap") == "a", F.col("q_val"))).alias("q_a"),
        F.min(F.when(F.col("snap") == "b", F.col("q_val"))).alias("q_b"),
        (
            F.min(F.when(F.col("snap") == "b", F.col("q_val")))
            - F.min(F.when(F.col("snap") == "a", F.col("q_val")))
        ).alias("shift"),
    )


@register(
    "drift_user_overlap",
    """
    WITH g AS (
      SELECT event_type, user_id,
        MAX(CASE WHEN epoch_us(ts) < 1705276800000000
                 THEN 1 ELSE 0 END) AS has_a,
        MAX(CASE WHEN epoch_us(ts) >= 1705276800000000
                 THEN 1 ELSE 0 END) AS has_b
      FROM events GROUP BY 1, 2
    ),
    j AS (
      SELECT event_type,
        CAST(SUM(has_a) AS BIGINT) AS u_a,
        CAST(SUM(has_b) AS BIGINT) AS u_b,
        CAST(SUM(has_a * has_b) AS BIGINT) AS u_both
      FROM g GROUP BY 1
    )
    SELECT event_type, u_a, u_b, u_both,
      CAST(u_both AS DOUBLE)
        / CAST(u_a + u_b - u_both AS DOUBLE) AS jaccard,
      CAST(u_both AS DOUBLE) / CAST(u_a AS DOUBLE) AS retention
    FROM j
    """,
    doc="Audience drift per event type between the first and second "
    "half of the event window (split at 2024-01-15 UTC, epoch-us "
    "literal — integer comparison, no engine date functions): "
    "distinct users in each half, their exact overlap, Jaccard "
    "similarity and retention share.  The family's CASE-split "
    "doctrine applied to set overlap: ONE scan reduces to per-(type, "
    "user) presence flags (MAX is partial-agg combinable), the "
    "second aggregate counts u_a / u_b / u_both from the flags — no "
    "filtered double scan, no full outer join.  The "
    "inclusion-exclusion denominator u_a + u_b - u_both stays "
    "integer; the two ratios are single IEEE divisions.  Scale: the "
    "one key exchange carries O(users x types) 16-byte keys — the "
    "exact-overlap cost every audience system pays; swap in HLL "
    "sketches (agg_approx_count_distinct's operator) when u_both can "
    "tolerate estimation error.",
)
def drift_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hana_bq_beam_connector_spark.queries._util import events_us

    split_us = 1_705_276_800_000_000
    ev = events_us(spark, sf_dir).select("event_type", "user_id", "ts")
    flags = ev.groupBy("event_type", "user_id").agg(
        F.max(F.when(F.col("ts") < split_us, 1).otherwise(0)).alias(
            "has_a"
        ),
        F.max(F.when(F.col("ts") >= split_us, 1).otherwise(0)).alias(
            "has_b"
        ),
    )
    g = flags.groupBy("event_type").agg(
        F.sum("has_a").cast("bigint").alias("u_a"),
        F.sum("has_b").cast("bigint").alias("u_b"),
        F.sum(F.col("has_a") * F.col("has_b"))
        .cast("bigint")
        .alias("u_both"),
    )
    return g.select(
        "event_type",
        "u_a",
        "u_b",
        "u_both",
        F.expr(
            "CAST(u_both AS DOUBLE)"
            " / CAST(u_a + u_b - u_both AS DOUBLE)"
        ).alias("jaccard"),
        F.expr("CAST(u_both AS DOUBLE) / CAST(u_a AS DOUBLE)").alias(
            "retention"
        ),
    )


# Wasserstein guard: the per-band term multiplies a cumulative count
# (<= n) by a band gap before the decimal cross-multiply, so the
# int64 product cum*gap must not wrap in a non-ANSI session.
_W1_GUARD = 2**62


@register(
    "drift_wasserstein_price",
    f"""
    WITH b AS ({_sql_cells(1000)}),
    cum AS (
      SELECT band,
        LEAD(band) OVER (ORDER BY band) AS next_band,
        CAST(SUM(c_a) OVER (ORDER BY band) AS BIGINT) AS cum_a,
        CAST(SUM(c_b) OVER (ORDER BY band) AS BIGINT) AS cum_b,
        CAST(SUM(c_a) OVER () AS BIGINT) AS n_a,
        CAST(SUM(c_b) OVER () AS BIGINT) AS n_b
      FROM b
    ),
    terms AS (
      SELECT band, cum_a * (next_band - band) AS wa,
             cum_b * (next_band - band) AS wb, n_a, n_b
      FROM cum WHERE next_band IS NOT NULL
    )
    SELECT n_a, n_b, CAST(COUNT(*) AS BIGINT) AS n_gaps,
      CAST(SUM(ABS(CAST(wa AS DECIMAL(19,0)) * CAST(n_b AS DECIMAL(19,0))
                 - CAST(wb AS DECIMAL(19,0)) * CAST(n_a AS DECIMAL(19,0))))
           AS DOUBLE) * 1000
        / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS w1_price
    FROM terms GROUP BY n_a, n_b
    """,
    doc="1-D Wasserstein-1 (earth mover's) distance between the two "
    "snapshot price distributions, in PRICE UNITS — the drift metric "
    "that, unlike KS (max gap) and TVD (mass moved), also weighs HOW "
    "FAR the mass moved: W1 = Σ_gaps |ECDF_a − ECDF_b| × gap.  Same "
    "100 TB formulation as the KS/TVD siblings: the cumulative "
    "window runs over the O(bands) cell frame (one fact scan, never "
    "a global sort), every term exact — cum×gap in guarded int64, "
    "the ECDF cross-products |cum_a·gap·n_b − cum_b·gap·n_a| in "
    "DECIMAL(38,0) (envelope ~1e17 rows/side), ONE closing IEEE "
    "expression.  The Spark side carries the same named raise_error "
    "division-form guard as the KS/TVD family so a non-ANSI cluster "
    "can never silently wrap the int64 product.",
)
def drift_wasserstein_price(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    b = _price_cells(spark, sf_dir, 1000)
    w_ord = Window.orderBy("band")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = b.select(
        "band",
        F.lead("band").over(w_ord).alias("next_band"),
        F.sum("c_a").over(w_cum).cast("bigint").alias("cum_a"),
        F.sum("c_b").over(w_cum).cast("bigint").alias("cum_b"),
        F.sum("c_a").over(w_all).cast("bigint").alias("n_a"),
        F.sum("c_b").over(w_all).cast("bigint").alias("n_b"),
    ).where(F.col("next_band").isNotNull())
    guarded_wa = (
        f"CASE WHEN greatest(cum_a, cum_b) > "
        f"{_W1_GUARD} DIV greatest(next_band - band, 1) THEN "
        "raise_error('drift_wasserstein_price: cum*gap outgrows "
        "int64; rebin to a coarser band grid') "
        "ELSE cum_a * (next_band - band) END"
    )
    terms = cum.select(
        F.expr(guarded_wa).alias("wa"),
        F.expr("cum_b * (next_band - band)").alias("wb"),
        "n_a",
        "n_b",
    )
    d19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    return (
        terms.groupBy("n_a", "n_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            F.sum(F.abs(d19("wa") * d19("n_b") - d19("wb") * d19("n_a")))
            .alias("num"),
        )
        .select(
            "n_a",
            "n_b",
            "n_gaps",
            F.expr(
                "CAST(num AS DOUBLE) * 1000"
                " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))"
            ).alias("w1_price"),
        )
    )
