from pandasvcf_spark.streaming.events import (
    dedup_events,
    read_events_stream,
    run_stream_to_memory,
    session_counts,
    sliding_counts,
    tumbling_counts,
)

__all__ = [
    "dedup_events",
    "read_events_stream",
    "run_stream_to_memory",
    "session_counts",
    "sliding_counts",
    "tumbling_counts",
]
