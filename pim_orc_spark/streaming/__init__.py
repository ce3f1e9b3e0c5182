"""Structured Streaming operators over the events stream (SURVEY.md
§2.7, §7.2 M5 — out of reference scope, north-star extension).
"""

from pim_orc_spark.streaming.stream_events import (
    read_events_stream,
    run_to_completion,
)
from pim_orc_spark.streaming import stream_events

__all__ = ["read_events_stream", "run_to_completion", "stream_events"]
