from hana_bq_beam_connector_spark.operators.relational import (
    asof_join,
    broadcast_join,
    range_join,
    salted_join,
    topk,
    topk_per_group,
)

__all__ = [
    "asof_join",
    "broadcast_join",
    "range_join",
    "salted_join",
    "topk",
    "topk_per_group",
]
