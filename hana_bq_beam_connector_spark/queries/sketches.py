"""Sketch queries: Count-Min frequency estimation (operators/sketch).

The reference has no aggregation surface at all (SURVEY §2b); sketches
are [X] scale surface — fixed-memory frequency summaries whose
exchange volume is bounded by the sketch size, not the key
cardinality (operators/sketch.py docstring has the full argument).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hana_bq_beam_connector_spark.operators.sketch import (
    CMS_COEFFS,
    _cell,
    cms_estimate,
    count_min_sketch,
    duck_cms_sql,
)
from hana_bq_beam_connector_spark.queries import register
from hana_bq_beam_connector_spark.sources.files import load_table

_W, _D = 1024, 4

_PROBE_CELL_ARMS = " UNION ALL ".join(
    f"SELECT l_partkey, {r} AS r, "
    f"{_cell('l_partkey', a, b, _W)} AS c FROM probes"
    for r, (a, b) in enumerate(CMS_COEFFS[:_D])
)


@register(
    "sketch_cms_frequency",
    f"""
    WITH sketch AS (
      {duck_cms_sql("SELECT l_partkey FROM lineitem", "l_partkey", _W, _D)}
    ),
    probes AS (
      SELECT DISTINCT l_partkey FROM lineitem WHERE l_partkey <= 20
    ),
    probe_cells AS ({_PROBE_CELL_ARMS}),
    est AS (
      SELECT p.l_partkey, MIN(COALESCE(s.cnt, 0)) AS est
      FROM probe_cells p
      LEFT JOIN sketch s USING (r, c)
      GROUP BY p.l_partkey
    ),
    exact AS (
      SELECT l_partkey, COUNT(*) AS exact_cnt
      FROM lineitem WHERE l_partkey <= 20 GROUP BY l_partkey
    )
    SELECT e.l_partkey, e.est, x.exact_cnt
    FROM est e JOIN exact x USING (l_partkey)
    """,
    doc="Count-Min sketch frequency estimation over lineitem part "
    "keys, probed for 20 keys with the exact count alongside (est >= "
    "exact always; equality whenever the key's cells are "
    "collision-free).  One fact scan builds the 4x1024 counter grid; "
    "map-side partial agg bounds the shuffle at d*w rows per task "
    "regardless of input size, and the finished sketch (KBs) "
    "broadcasts to the probe join — the fixed-memory alternative to "
    "shuffling a 10^9-key groupBy when only approximate counts are "
    "needed.  Same affine-hash toolbox as MinHash, so the oracle "
    "rebuilds the identical grid.",
)
def sketch_cms_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sketch = count_min_sketch(
        li.select("l_partkey"), "l_partkey", w=_W, d=_D
    )
    probed = li.where(F.col("l_partkey") <= 20)
    probes = probed.select("l_partkey").distinct()
    est = cms_estimate(sketch, probes, "l_partkey", w=_W, d=_D)
    exact = probed.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("exact_cnt")
    )
    return est.join(exact, "l_partkey").select(
        "l_partkey", "est", "exact_cnt"
    )


@register(
    "sketch_bitmap_distinct_exact",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
    doc="EXACT per-group distinct users via the two-level bitmap "
    "aggregate (operators/sketch.bitmap_distinct): bit-OR words per "
    "(group, id div 64) then sum(bit_count) — both levels map-side "
    "partial, exchange bounded by touched id-buckets, and the word "
    "table doubles as a mergeable incremental distinct index.  Oracle "
    "is the semantically-equal COUNT(DISTINCT).",
)
def sketch_bitmap_distinct_exact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from hana_bq_beam_connector_spark.operators.sketch import (
        bitmap_distinct,
    )

    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    nd = bitmap_distinct(
        e, group_cols=["event_type"], id_expr="user_id", out="n_users"
    )
    return nd.join(counts, "event_type").select(
        "event_type", "n_users", "n_events"
    )
