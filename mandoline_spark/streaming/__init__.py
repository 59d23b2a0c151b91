"""Structured Streaming surface over the events schema.

The reference engine is purely batch — its ``stream``
(/root/reference/src/io/mandoline/mandoline.clj:223-258) is a lazy seq
of chunk reads, not a continuous stream — so this module is the
SURVEY §2B extension surface (Q25–Q27 streaming forms): event-time
windows with watermarks, gap-based session windows, and a custom
stateful operator on the ``applyInPandasWithState`` surface.
"""

from .ops import (
    EVENTS_SCHEMA,
    dedup_stream,
    interval_join_streams,
    neardup_gate_stream,
    read_events_stream,
    read_pieces_stream,
    run_available_now,
    session_counts,
    sessionize_stateful,
    sliding_sums,
    stream_ingest,
    tumbling_counts,
)

__all__ = [
    "EVENTS_SCHEMA",
    "dedup_stream",
    "interval_join_streams",
    "neardup_gate_stream",
    "read_events_stream",
    "read_pieces_stream",
    "run_available_now",
    "session_counts",
    "sessionize_stateful",
    "sliding_sums",
    "stream_ingest",
    "tumbling_counts",
]
