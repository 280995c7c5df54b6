from .ingest import (
    read_accumulated_pairs,
    read_band_index,
    streaming_neardup_ingest,
)
from .windows import (
    read_events_stream,
    run_stream_to_memory,
    streaming_session_agg,
    streaming_sliding_agg,
    streaming_tumbling_agg,
)

__all__ = [
    "read_accumulated_pairs",
    "read_band_index",
    "read_events_stream",
    "run_stream_to_memory",
    "streaming_neardup_ingest",
    "streaming_session_agg",
    "streaming_sliding_agg",
    "streaming_tumbling_agg",
]
