from bht_etl_app_spark.streaming.events import (
    combine_partials,
    foreach_batch_partials,
    read_event_stream,
    sessionized_counts,
    sliding_event_counts,
    stateful_user_running_totals,
    stream_static_enrich,
    stream_stream_attribution,
    stream_to_memory,
    streaming_dedup,
    tumbling_event_counts,
)

__all__ = [
    "combine_partials",
    "foreach_batch_partials",
    "read_event_stream",
    "sessionized_counts",
    "sliding_event_counts",
    "stateful_user_running_totals",
    "stream_static_enrich",
    "stream_stream_attribution",
    "stream_to_memory",
    "streaming_dedup",
    "tumbling_event_counts",
]
