from .incremental import (  # noqa: F401
    StreamingPhysicalIndex,
    compact_segments,
    incremental_index_stream,
)
