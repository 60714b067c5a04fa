"""Registry-wide physical-plan audit.

Every declared query's plan is checked for the two operators that
mean "this will not survive 100 TB": CartesianProduct and
BroadcastNestedLoopJoin.  Exceptions are explicit and justified:

* the brute-force similarity baselines intentionally broadcast a
  small query set against the corpus (crossJoin(broadcast(q)) plans
  as BroadcastNestedLoopJoin with bounded build side) — they are the
  documented exact baselines, not the scale path;
* the live streaming queries execute a real stream inside the query
  function; their plans are covered by tests/test_streaming.py.
"""

from __future__ import annotations

import pytest

from hana_bq_beam_connector_spark.queries import registry

# name -> why it's allowed to nested-loop / cross
_ALLOWED = {
    "sim_cosine_topk_exact": "exact baseline: bounded query set broadcast",
    "mm_feature_topk": "exact baseline over media features",
    "sim_ivf_topk": "centroid set (16 rows) broadcast for assignment",
    "stream_late_events": "single-row watermark aggregate broadcast",
    "subquery_above_avg_balance": "scalar aggregate broadcast as literal",
    "agg_having_share_of_total": "global-total scalar (1 row) broadcast",
}
_SKIP_EXECUTING = {
    # these run a real streaming query inside fn(); plan checked in
    # tests/test_streaming.py instead
    "stream_stateful_distinct_users",
    "stream_interval_join_live",
}

_SPECS = [
    s
    for s in registry().values()
    if s.name not in _SKIP_EXECUTING and s.name not in _ALLOWED
]


@pytest.mark.parametrize("spec", _SPECS, ids=[s.name for s in _SPECS])
def test_no_cartesian_or_nested_loop(spark, sf_dir, spec):
    plan = (
        spec.fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, spec.name
    assert "BroadcastNestedLoopJoin" not in plan, spec.name
