from .dedup import dedup_stream, dedup_stream_job  # noqa: F401
from .alerts import percolate_alerts_stream, read_alerts  # noqa: F401
from .events import (  # noqa: F401
    sessionize_events,
    sessionize_events_stateful,
    windowed_event_counts,
)
from .incremental import (  # noqa: F401
    StreamingPhysicalIndex,
    compact_segments,
    incremental_index_stream,
)
from .eql import eql_sequence_stream  # noqa: F401
