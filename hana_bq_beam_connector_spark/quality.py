"""Zero-extra-pass data-quality telemetry (``df.observe``).

A production copy pipeline (the reference's whole job,
``HanaToBQ.java:246-260``) is blind: it reports nothing about what it
moved — no row counts, no null rates, no out-of-range checks — and
any post-hoc audit query re-reads the sink.  Spark's ``Observation``
API attaches aggregate metrics to the SAME action that writes the
data: the metrics are computed map-side inside the existing scan
(an ``CollectMetrics`` node in the plan, folded into whole-stage
codegen), so at 100 TB the audit is *free* — no second pass, no extra
shuffle, no driver collect of data rows.

Usage::

    audited, obs = observe_quality(df, checks={
        "null_ts": F.sum(F.col("ts").isNull().cast("long")),
        "neg_value": F.sum((F.col("value") < 0).cast("long")),
    })
    parquet_append(audited, path)       # one action: write + audit
    metrics = obs.get                   # {"rows": ..., "null_ts": ...}
    assert_expectations(metrics, {"null_ts": 0})
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


class QualityViolation(RuntimeError):
    """An expectation over observed metrics failed after an action."""


def observe_quality(
    df: DataFrame,
    checks: dict[str, Column] | None = None,
    name: str | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach row-count + caller metrics to ``df``'s next action.

    Returns ``(df_with_metrics, observation)``.  Every metric must be
    an aggregate expression (Spark enforces this); they evaluate
    during the action that consumes the returned frame — reading
    ``observation.get`` before any action blocks, after it is O(1).

    ``name`` defaults to auto-unique: two audited frames composed
    into ONE query (audit the source, transform, audit the output)
    would otherwise both register the same observed-metric name and
    fail analysis at the action.
    """
    metrics: dict[str, Column] = {"rows": F.count(F.lit(1))}
    if checks:
        overlap = set(checks) & set(metrics)
        if overlap:
            raise ValueError(f"reserved metric names: {sorted(overlap)}")
        metrics.update(checks)
    obs = Observation(name) if name is not None else Observation()
    audited = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    return audited, obs


def null_rate_checks(df: DataFrame, cols: list[str]) -> dict[str, Column]:
    """Per-column null counters (join with ``rows`` for the rate).

    Coalesced to 0: a SUM over zero rows is SQL NULL, which would make
    an EMPTY batch (a legitimate no-op window) observe ``None`` and
    spuriously fail an ``expected = 0`` expectation."""
    return {
        f"nulls_{c}": F.coalesce(
            F.sum(F.col(c).isNull().cast("long")), F.lit(0)
        )
        for c in cols
    }


def assert_expectations(
    metrics: dict[str, object],
    expectations: dict[str, object],
) -> None:
    """Raise ``QualityViolation`` listing every metric that missed its
    expected value (exact match; use a count-of-violations metric to
    express thresholds)."""
    bad = {
        k: (metrics.get(k), want)
        for k, want in expectations.items()
        if metrics.get(k) != want
    }
    if bad:
        detail = "; ".join(
            f"{k}: observed={got!r} expected={want!r}"
            for k, (got, want) in sorted(bad.items())
        )
        raise QualityViolation(detail)
