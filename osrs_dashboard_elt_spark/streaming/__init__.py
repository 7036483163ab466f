"""Structured Streaming variant of the ingest+parse half of the
pipeline (SURVEY.md §2.9)."""

from .ingest import (
    RAW_LOG_SCHEMA,
    read_raw_stream,
    start_parse_pipeline,
    streaming_session_rollup,
    streaming_windowed_rollup,
    with_late_data_dedup,
)

__all__ = [
    "RAW_LOG_SCHEMA",
    "read_raw_stream",
    "start_parse_pipeline",
    "streaming_session_rollup",
    "streaming_windowed_rollup",
    "with_late_data_dedup",
]
