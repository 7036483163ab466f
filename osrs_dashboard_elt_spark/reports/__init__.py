from .generators import (
    collection_log_report,
    detailed_report,
    leaderboard_report,
    parse_item_and_quantity,
    personal_bests_report,
    recent_achievements_report,
    timeseries_report,
)

__all__ = [
    "collection_log_report",
    "detailed_report",
    "leaderboard_report",
    "parse_item_and_quantity",
    "personal_bests_report",
    "recent_achievements_report",
    "timeseries_report",
]
