from hana_bq_beam_connector_spark.plans.chunking import (
    Interval,
    equi_depth_intervals,
    equi_depth_intervals_exact,
    intervals_to_jdbc_predicates,
)

__all__ = [
    "Interval",
    "equi_depth_intervals",
    "equi_depth_intervals_exact",
    "intervals_to_jdbc_predicates",
]
