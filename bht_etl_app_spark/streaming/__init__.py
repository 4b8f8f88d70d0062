from bht_etl_app_spark.streaming.events import (
    read_event_stream,
    sessionized_counts,
    sliding_event_counts,
    stateful_user_running_totals,
    stream_to_memory,
    tumbling_event_counts,
)

__all__ = [
    "read_event_stream",
    "sessionized_counts",
    "sliding_event_counts",
    "stateful_user_running_totals",
    "stream_to_memory",
    "tumbling_event_counts",
]
