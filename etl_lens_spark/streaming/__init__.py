from etl_lens_spark.streaming.stream_ops import (
    EVENTS_STREAM_SCHEMA,
    events_stream,
    run_to_memory,
    session_window_stats,
    sliding_window_counts,
    stateful_dedup,
    tumbling_window_counts,
)

__all__ = [
    "EVENTS_STREAM_SCHEMA",
    "events_stream",
    "run_to_memory",
    "session_window_stats",
    "sliding_window_counts",
    "stateful_dedup",
    "tumbling_window_counts",
]
