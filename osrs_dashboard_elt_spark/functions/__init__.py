"""Column-expression function libraries (no Python in the hot path)."""

from .durations import duration_seconds, seconds_to_duration
from .temporal import Period, standard_periods, period_agg_columns
from .text import (
    clean_discord_escapes,
    doc_fingerprint,
    language_id,
    parse_item_quantity,
    quality_score_cols,
    token_count,
)

__all__ = [
    "duration_seconds",
    "seconds_to_duration",
    "Period",
    "standard_periods",
    "period_agg_columns",
    "clean_discord_escapes",
    "doc_fingerprint",
    "language_id",
    "parse_item_quantity",
    "quality_score_cols",
    "token_count",
]
