"""Structured Streaming: session windows, tumbling aggregates, event parsing."""

from .sessions import (  # noqa: F401
    streaming_session_stats,
    streaming_tumbling_counts,
    run_stream_to_memory,
)
