from .stream import (
    route_sinks,
    run_to_memory,
    sessionize,
    stream_source,
    streaming_dedup,
    windowed_agg,
)

__all__ = [
    "stream_source", "windowed_agg", "streaming_dedup", "sessionize",
    "route_sinks", "run_to_memory",
]
