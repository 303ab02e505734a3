from etl_lens_spark.streaming.stream_ops import (
    events_stream,
    run_to_memory,
    session_window_stats,
    sliding_window_counts,
    stateful_dedup,
    tumbling_window_counts,
)

__all__ = [
    "events_stream",
    "run_to_memory",
    "session_window_stats",
    "sliding_window_counts",
    "stateful_dedup",
    "tumbling_window_counts",
]
