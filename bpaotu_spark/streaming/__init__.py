"""Structured Streaming jobs over the events table."""

from bpaotu_spark.streaming.jobs import (
    read_events_stream,
    run_to_memory,
    sessionize_stream,
    windowed_agg_stream,
)

__all__ = [
    "read_events_stream",
    "run_to_memory",
    "sessionize_stream",
    "windowed_agg_stream",
]

from bpaotu_spark.streaming.jobs import dedup_stream, running_user_totals  # noqa: E402

__all__ += ["dedup_stream", "running_user_totals"]
