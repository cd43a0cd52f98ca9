"""Structured Streaming demonstrations over the events table."""

from multi_threaded_mapreduce_framework_spark.streaming.stateful import (
    running_user_totals,
)
from multi_threaded_mapreduce_framework_spark.streaming.windowed import (
    events_stream,
    replay_events,
    run_to_convergence,
    session_counts,
    sliding_window_counts,
    stream_dedup,
    tumbling_window_counts,
)

__all__ = [
    "running_user_totals",
    "events_stream",
    "replay_events",
    "run_to_convergence",
    "session_counts",
    "sliding_window_counts",
    "stream_dedup",
    "tumbling_window_counts",
]
