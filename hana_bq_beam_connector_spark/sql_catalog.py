"""SQL catalog: expose the whole engine surface to plain ``spark.sql``.

``register_views`` publishes every testdata table and every registry
query as temp views, so a SQL-only consumer (BI tool, notebook,
``spark.sql`` scripts) can use the engine without touching the Python
API — the views are lazy logical plans, so composing them in further
SQL keeps a single Catalyst plan (filters still push through view
boundaries into the scans).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from hana_bq_beam_connector_spark.queries import registry
from hana_bq_beam_connector_spark.sources.files import (
    TESTDATA_TABLES,
    load_table,
)


def register_views(
    spark: SparkSession,
    sf_dir: str,
    queries: bool | list[str] = True,
) -> list[str]:
    """Create temp views for all tables (bare names) and registry
    queries (``q_<name>``).  ``queries`` may be a name subset — the
    iterative queries (clustering) run jobs at plan-construction
    time, so a SQL session that doesn't need them shouldn't pay for
    them.  Returns the view names created."""
    names: list[str] = []
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        names.append(t)
    if queries:
        specs = registry()
        wanted = (
            list(specs) if queries is True else list(queries)
        )
        for name in wanted:
            specs[name].fn(spark, sf_dir).createOrReplaceTempView(
                f"q_{name}"
            )
            names.append(f"q_{name}")
    return names
