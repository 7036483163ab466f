"""Sources & sinks: parquet read/write, idempotent dedup-append,
watermarks, atomic publish."""

from .parquet import (
    dedup_append,
    max_watermark,
    per_key_watermark,
    publish_overwrite,
    read_new_since,
)

__all__ = [
    "dedup_append",
    "max_watermark",
    "per_key_watermark",
    "publish_overwrite",
    "read_new_since",
]
