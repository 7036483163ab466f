"""Structured Streaming variant of the ingest+parse half of the
pipeline (SURVEY.md §2.9)."""

from .dedup_ingest import start_dedup_ingest
from .incremental_sink import incremental_state_sink, read_state
from .ingest import (
    RAW_LOG_SCHEMA,
    read_raw_stream,
    retry_unparsed,
    start_parse_pipeline,
    split_corrupt,
    streaming_session_rollup,
    streaming_windowed_rollup,
    with_late_data_dedup,
)
from .stream_join import stream_interval_join
from .stateful import (
    changelog_via_stream,
    running_best_changelog,
    running_best_changelog_tws,
)
from .upsert_sink import (
    ExternalUpsertSink,
    LocalJsonTransport,
    NotFoundError,
)

__all__ = [
    "ExternalUpsertSink",
    "incremental_state_sink",
    "read_state",
    "LocalJsonTransport",
    "NotFoundError",
    "RAW_LOG_SCHEMA",
    "changelog_via_stream",
    "read_raw_stream",
    "retry_unparsed",
    "running_best_changelog",
    "running_best_changelog_tws",
    "split_corrupt",
    "start_dedup_ingest",
    "start_parse_pipeline",
    "stream_interval_join",
    "streaming_session_rollup",
    "streaming_windowed_rollup",
    "with_late_data_dedup",
]