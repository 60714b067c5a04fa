from hana_bq_beam_connector_spark.streaming.windows import (
    events_stream,
    run_available_now,
    session_agg,
    sliding_agg,
    tumbling_agg,
)

__all__ = [
    "events_stream",
    "run_available_now",
    "session_agg",
    "sliding_agg",
    "tumbling_agg",
]
