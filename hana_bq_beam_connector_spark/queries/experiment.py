"""Experimentation / A-B-testing queries (SURVEY §2c experimentation
[X] — NEW group, round 5).

The analysis layer every product team runs on the event stream:
deterministic hash assignment of users to arms, sample-ratio-mismatch
(SRM) health checks, conversion-lift z statistics, CUPED variance
reduction from pre-period covariates, and per-arm engagement
profiles.  The reference has none of this; every query is an engine
extension.

Determinism doctrine: arm assignment is pure integer arithmetic
(``(user_id * 2654435761) % 100 < 50`` — a Knuth multiplicative
hash; no engine RNG anywhere, so assignment is reproducible across
runs, engines and SFs).  All counts/moments are exact integers
(values aggregate through exact DECIMAL(18,2) and convert to BIGINT
cents before any second moment, the stats-family convention); each
closing statistic is ONE textually identical IEEE expression.  SQRT
is correctly rounded per IEEE-754, so the z statistic is bit-stable
cross-engine — the one "transcendental-looking" function that is
actually exact.

Scale: every query is one CASE-split scan of the event log reduced
to per-(user, arm) flags/sums (map-side combinable), then an O(arms)
or O(users) aggregate; nothing joins raw events to raw events.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hana_bq_beam_connector_spark.queries import register
from hana_bq_beam_connector_spark.queries._util import events_us
from hana_bq_beam_connector_spark.sources.files import load_table

_KNUTH = 2_654_435_761
# pre/post split: 2024-01-15 UTC in epoch µs (drift_user_overlap's)
_SPLIT_US = 1_705_276_800_000_000

_SQL_ARM = (
    f"CASE WHEN (user_id * {_KNUTH}) % 100 < 50 "
    "THEN 'treatment' ELSE 'control' END"
)

# int64 envelope of the arm hash: user_id * _KNUTH must not wrap.
# Past this bound a non-ANSI Spark session wraps silently (negative
# remainder => every row lands in 'treatment') while ANSI/DuckDB
# raise — a cross-engine divergence, not an answer.  The SPARK faces
# (batch + streaming) carry a named raise_error guard wrapped around
# user_id itself so it preempts any generic overflow; the DuckDB
# oracle stays the plain expression (DuckDB raises natively, and the
# guard branch is never taken at any contract SF).
_UID_MAX = (2**63 - 1) // _KNUTH  # 3_474_701_543

_SPARK_ARM = (
    f"CASE WHEN ((CASE WHEN user_id > {_UID_MAX}L OR "
    f"user_id < -{_UID_MAX}L THEN raise_error("
    f"'experiment arm hash: |user_id| * {_KNUTH} exceeds int64 "
    f"(|user_id| <= {_UID_MAX}); rehash ids (e.g. xxhash64) before "
    f"arm assignment') ELSE user_id END) * {_KNUTH}L) % 100 < 50 "
    "THEN 'treatment' ELSE 'control' END"
)


def _arm_col() -> Column:
    return F.expr(_SPARK_ARM)


@register(
    "exp_assignment_srm_check",
    f"""
    WITH u AS (
      SELECT DISTINCT user_id, {_SQL_ARM} AS arm FROM events
    ),
    c AS (
      SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users FROM u GROUP BY 1
    ),
    t AS (SELECT CAST(SUM(n_users) AS BIGINT) AS n_total FROM c)
    SELECT c.arm, c.n_users, t.n_total,
      CAST(t.n_total AS DOUBLE) / 2 AS expected,
      (CAST(c.n_users AS DOUBLE) - CAST(t.n_total AS DOUBLE) / 2)
      * (CAST(c.n_users AS DOUBLE) - CAST(t.n_total AS DOUBLE) / 2)
      / (CAST(t.n_total AS DOUBLE) / 2) AS srm_chi2_term
    FROM c CROSS JOIN t
    """,
    doc="Sample-ratio-mismatch health check: users dedupe to one row "
    "each (assignment is a pure-integer Knuth hash on user_id — "
    "reproducible, no RNG), per-arm counts compare against the "
    "designed 50/50 split via per-cell chi-square terms (sum them "
    "and compare to the chi2(1) threshold — the sum is left to the "
    "consumer per the cross-row-double-sum rule).  An SRM fire means "
    "the experiment's randomization is broken and every downstream "
    "readout is garbage — this query runs FIRST in any analysis.  "
    "One distinct-user reduce; the 1-row total broadcasts.",
)
def exp_assignment_srm_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.select("user_id").distinct().select(
        "user_id", _arm_col().alias("arm")
    )
    c = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    t = c.agg(F.sum("n_users").cast("bigint").alias("n_total"))
    term = (
        "(CAST(n_users AS DOUBLE) - CAST(n_total AS DOUBLE) / 2)"
        " * (CAST(n_users AS DOUBLE) - CAST(n_total AS DOUBLE) / 2)"
        " / (CAST(n_total AS DOUBLE) / 2)"
    )
    return c.crossJoin(F.broadcast(t)).select(
        "arm",
        "n_users",
        "n_total",
        F.expr("CAST(n_total AS DOUBLE) / 2").alias("expected"),
        F.expr(term).alias("srm_chi2_term"),
    )


@register(
    "exp_conversion_lift_z",
    f"""
    WITH u AS (
      SELECT user_id, {_SQL_ARM} AS arm,
        MAX(CASE WHEN event_type = 'purchase' AND value >= 150
            THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY 1, 2
    ),
    a AS (
      SELECT
        CAST(SUM(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_t,
        CAST(SUM(CASE WHEN arm = 'treatment' THEN converted ELSE 0 END)
          AS BIGINT) AS conv_t,
        CAST(SUM(CASE WHEN arm = 'control' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_c,
        CAST(SUM(CASE WHEN arm = 'control' THEN converted ELSE 0 END)
          AS BIGINT) AS conv_c
      FROM u
    )
    SELECT n_t, conv_t, n_c, conv_c,
      CAST(conv_t AS DOUBLE) / CAST(n_t AS DOUBLE) AS rate_t,
      CAST(conv_c AS DOUBLE) / CAST(n_c AS DOUBLE) AS rate_c,
      CAST(conv_t AS DOUBLE) / CAST(n_t AS DOUBLE)
        - CAST(conv_c AS DOUBLE) / CAST(n_c AS DOUBLE) AS lift,
      (CAST(conv_t AS DOUBLE) / CAST(n_t AS DOUBLE)
        - CAST(conv_c AS DOUBLE) / CAST(n_c AS DOUBLE))
      / SQRT(
          (CAST(conv_t + conv_c AS DOUBLE) / CAST(n_t + n_c AS DOUBLE))
          * (1 - CAST(conv_t + conv_c AS DOUBLE)
               / CAST(n_t + n_c AS DOUBLE))
          * (1.0 / CAST(n_t AS DOUBLE) + 1.0 / CAST(n_c AS DOUBLE))
        ) AS z_stat
    FROM a
    """,
    doc="Two-proportion conversion lift with the pooled z statistic (conversion = a high-value purchase, value >= 150 — a mid-prevalence definition at every SF, so the pooled rate stays strictly inside (0,1) and the z denominator never degenerates): "
    "ONE CASE-split scan reduces events to per-user (arm, converted) "
    "flags, one more aggregate to the four exact integers (n, "
    "conversions per arm), and the readout row computes rates, lift "
    "and z as textually identical IEEE expressions.  SQRT is "
    "correctly rounded per IEEE-754 — the one transcendental-looking "
    "function that is bit-exact — so the statistic is deterministic "
    "cross-engine at any scale with NO guard needed (every operand "
    "is a ratio in [0,1]).",
)
def exp_conversion_lift_z(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id", _arm_col().alias("arm")).agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") >= 150),
                1,
            ).otherwise(0)
        ).alias("converted")
    )
    is_t = F.col("arm") == "treatment"
    a = u.agg(
        F.sum(F.when(is_t, 1).otherwise(0)).cast("bigint").alias("n_t"),
        F.sum(F.when(is_t, F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_t"),
        F.sum(F.when(~is_t, 1).otherwise(0)).cast("bigint").alias("n_c"),
        F.sum(F.when(~is_t, F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_c"),
    )
    rate_t = "CAST(conv_t AS DOUBLE) / CAST(n_t AS DOUBLE)"
    rate_c = "CAST(conv_c AS DOUBLE) / CAST(n_c AS DOUBLE)"
    pooled = (
        "CAST(conv_t + conv_c AS DOUBLE) / CAST(n_t + n_c AS DOUBLE)"
    )
    z = (
        f"({rate_t} - {rate_c}) / SQRT(({pooled}) * (1 - {pooled})"
        " * (1.0 / CAST(n_t AS DOUBLE) + 1.0 / CAST(n_c AS DOUBLE)))"
    )
    return a.select(
        "n_t",
        "conv_t",
        "n_c",
        "conv_c",
        F.expr(rate_t).alias("rate_t"),
        F.expr(rate_c).alias("rate_c"),
        F.expr(f"{rate_t} - {rate_c}").alias("lift"),
        F.expr(z).alias("z_stat"),
    )


@register(
    "exp_cuped_adjusted_lift",
    f"""
    WITH u AS (
      SELECT user_id, {_SQL_ARM} AS arm,
        CAST(COALESCE(SUM(CASE WHEN epoch_us(ts) < {_SPLIT_US}
          THEN CAST(value AS DECIMAL(18,2)) END) * 100, 0) AS BIGINT)
          // 100 AS pre_d,
        CAST(COALESCE(SUM(CASE WHEN epoch_us(ts) >= {_SPLIT_US}
          THEN CAST(value AS DECIMAL(18,2)) END) * 100, 0) AS BIGINT)
          // 100 AS post_d
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(pre_d) AS BIGINT) AS sx,
        CAST(SUM(post_d) AS BIGINT) AS sy,
        CAST(SUM(pre_d * pre_d) AS BIGINT) AS sxx,
        CAST(SUM(pre_d * post_d) AS BIGINT) AS sxy,
        CAST(SUM(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_t,
        CAST(SUM(CASE WHEN arm = 'treatment' THEN post_d ELSE 0 END)
          AS BIGINT) AS sy_t,
        CAST(SUM(CASE WHEN arm = 'treatment' THEN pre_d ELSE 0 END)
          AS BIGINT) AS sx_t,
        CAST(SUM(CASE WHEN arm = 'control' THEN 1 ELSE 0 END)
          AS BIGINT) AS n_c,
        CAST(SUM(CASE WHEN arm = 'control' THEN post_d ELSE 0 END)
          AS BIGINT) AS sy_c,
        CAST(SUM(CASE WHEN arm = 'control' THEN pre_d ELSE 0 END)
          AS BIGINT) AS sx_c
      FROM u
    )
    SELECT n, n_t, n_c,
      (CAST(sxy AS DOUBLE) / n
        - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
      / (CAST(sxx AS DOUBLE) / n
        - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
        AS theta,
      CAST(sy_t AS DOUBLE) / n_t - CAST(sy_c AS DOUBLE) / n_c
        AS raw_lift,
      CAST(sx_t AS DOUBLE) / n_t - CAST(sx_c AS DOUBLE) / n_c
        AS pre_diff,
      (CAST(sy_t AS DOUBLE) / n_t - CAST(sy_c AS DOUBLE) / n_c)
      - ((CAST(sxy AS DOUBLE) / n
           - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
         / (CAST(sxx AS DOUBLE) / n
           - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)))
        * (CAST(sx_t AS DOUBLE) / n_t - CAST(sx_c AS DOUBLE) / n_c)
        AS cuped_lift
    FROM m
    """,
    doc="CUPED variance reduction: per-user pre-period spend (the "
    "covariate) and post-period spend (the metric), each an exact "
    "decimal sum truncated to integer DOLLARS (cents // 100 — the "
    "identical integer floor-division in both engines; values are "
    "non-negative by domain), pooled theta = cov(pre, post)/var(pre) "
    "from exact integer moments, and the adjusted lift "
    "raw_lift − theta·(pre_t − pre_c).  The dollar truncation keeps "
    "Σx² inside int64 to ~9e10 users (vs ~9e6 in cents²); every "
    "emitted value is a textually identical IEEE expression over "
    "exactly-converted int64 operands.  ONE CASE-split scan to "
    "per-user sums, one moment aggregate, a 1-row readout — the "
    "doctrine shape for 'run a regression on 100 TB of events'.",
)
def exp_cuped_adjusted_lift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = events_us(spark, sf_dir)
    pre = F.when(
        F.col("ts") < _SPLIT_US, F.col("value").cast("decimal(18,2)")
    )
    post = F.when(
        F.col("ts") >= _SPLIT_US, F.col("value").cast("decimal(18,2)")
    )
    u = ev.groupBy("user_id", _arm_col().alias("arm")).agg(
        F.coalesce(F.sum(pre) * 100, F.lit(0))
        .cast("bigint")
        .alias("pre_cents"),
        F.coalesce(F.sum(post) * 100, F.lit(0))
        .cast("bigint")
        .alias("post_cents"),
    ).select(
        "arm",
        F.expr("pre_cents div 100").alias("pre_d"),
        F.expr("post_cents div 100").alias("post_d"),
    )
    is_t = F.col("arm") == "treatment"
    m = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("pre_d").cast("bigint").alias("sx"),
        F.sum("post_d").cast("bigint").alias("sy"),
        F.sum(F.col("pre_d") * F.col("pre_d"))
        .cast("bigint")
        .alias("sxx"),
        F.sum(F.col("pre_d") * F.col("post_d"))
        .cast("bigint")
        .alias("sxy"),
        F.sum(F.when(is_t, 1).otherwise(0)).cast("bigint").alias("n_t"),
        F.sum(F.when(is_t, F.col("post_d")).otherwise(0))
        .cast("bigint")
        .alias("sy_t"),
        F.sum(F.when(is_t, F.col("pre_d")).otherwise(0))
        .cast("bigint")
        .alias("sx_t"),
        F.sum(F.when(~is_t, 1).otherwise(0)).cast("bigint").alias("n_c"),
        F.sum(F.when(~is_t, F.col("post_d")).otherwise(0))
        .cast("bigint")
        .alias("sy_c"),
        F.sum(F.when(~is_t, F.col("pre_d")).otherwise(0))
        .cast("bigint")
        .alias("sx_c"),
    )
    theta = (
        "(CAST(sxy AS DOUBLE) / n"
        " - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))"
        " / (CAST(sxx AS DOUBLE) / n"
        " - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))"
    )
    raw = "CAST(sy_t AS DOUBLE) / n_t - CAST(sy_c AS DOUBLE) / n_c"
    pre_diff = "CAST(sx_t AS DOUBLE) / n_t - CAST(sx_c AS DOUBLE) / n_c"
    return m.select(
        "n",
        "n_t",
        "n_c",
        F.expr(theta).alias("theta"),
        F.expr(raw).alias("raw_lift"),
        F.expr(pre_diff).alias("pre_diff"),
        F.expr(f"({raw}) - ({theta}) * ({pre_diff})").alias(
            "cuped_lift"
        ),
    )


@register(
    "exp_engagement_by_arm",
    f"""
    WITH u AS (
      SELECT user_id, {_SQL_ARM} AS arm,
        CAST(COUNT(*) AS BIGINT) AS n_events,
        CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
        CAST(COUNT(DISTINCT CAST(epoch_us(ts) // 86400000000 AS BIGINT))
          AS BIGINT) AS n_active_days
      FROM events GROUP BY 1, 2
    )
    SELECT arm,
      CAST(COUNT(*) AS BIGINT) AS n_users,
      CAST(SUM(n_events) AS BIGINT) AS total_events,
      CAST(SUM(n_events) AS DOUBLE) / COUNT(*) AS events_per_user,
      CAST(SUM(n_active_days) AS DOUBLE) / COUNT(*)
        AS active_days_per_user,
      CAST(SUM(CASE WHEN n_types = 5 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_full_funnel_users
    FROM u GROUP BY 1
    """,
    doc="Per-arm engagement guardrails: events per user, distinct "
    "active days per user (epoch-µs integer day buckets — no engine "
    "date functions), and how many users touched every event type.  "
    "The guardrail readout that catches 'treatment converts more "
    "but users go silent'.  One scan to per-user counters, one "
    "O(users) rollup; means are single IEEE divisions of exact "
    "integers.",
)
def exp_engagement_by_arm(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = events_us(spark, sf_dir)
    u = ev.groupBy("user_id", _arm_col().alias("arm")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("event_type").cast("bigint").alias("n_types"),
        F.countDistinct(
            F.floor(F.col("ts") / 86_400_000_000).cast("bigint")
        )
        .cast("bigint")
        .alias("n_active_days"),
    )
    return u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("n_events").cast("bigint").alias("total_events"),
        (F.sum("n_events").cast("double") / F.count(F.lit(1))).alias(
            "events_per_user"
        ),
        (
            F.sum("n_active_days").cast("double") / F.count(F.lit(1))
        ).alias("active_days_per_user"),
        F.sum(F.when(F.col("n_types") == 5, 1).otherwise(0))
        .cast("bigint")
        .alias("n_full_funnel_users"),
    )
