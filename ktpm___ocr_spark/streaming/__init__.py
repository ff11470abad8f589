"""Structured Streaming surface.

The reference has NO stream processing (SURVEY §2.10) — its async path is
an at-least-once work queue, which this engine maps to batch + manifest
resume (metrics.py). This module exists for the engine's own completeness
as a data platform: the same windowed operators (W4 rate windows, A2
counters) expressed over an unbounded source, with event-time watermarks
for late data, so a user can run the monitoring queries continuously
instead of re-running batch.
"""

from ktpm___ocr_spark.streaming.jobs import (  # noqa: F401
    sessionize_batch,
    stream_rate_windows,
    stream_stage_counters,
)
