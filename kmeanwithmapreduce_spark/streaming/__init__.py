from .windows import (
    read_events_stream,
    run_stream_to_memory,
    streaming_session_agg,
    streaming_sliding_agg,
    streaming_tumbling_agg,
)

__all__ = [
    "read_events_stream",
    "run_stream_to_memory",
    "streaming_session_agg",
    "streaming_sliding_agg",
    "streaming_tumbling_agg",
]
