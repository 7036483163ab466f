"""Sources & sinks: parquet read/write, idempotent dedup-append,
watermarks, atomic publish."""

from .io import (
    filter_newer_than_watermarks,
    incremental_scan,
    publish_blue_green,
    read_published,
)
from .parquet import (
    dedup_append,
    max_watermark,
    new_rows_against,
    prune_to_window,
    per_key_watermark,
    publish_overwrite,
    read_new_since,
)

__all__ = [
    "dedup_append",
    "filter_newer_than_watermarks",
    "incremental_scan",
    "max_watermark",
    "new_rows_against",
    "prune_to_window",
    "per_key_watermark",
    "publish_blue_green",
    "publish_overwrite",
    "read_new_since",
    "read_published",
]
