from .scalar import (
    date_id,
    from_utc,
    is_weekend,
    minute_of_day,
    ms_to_sec_round,
    ms_to_sec_trunc,
    normalize_release_date,
    part_of_day,
    safe_percent,
    to_utc,
)

__all__ = [
    "date_id",
    "from_utc",
    "is_weekend",
    "minute_of_day",
    "ms_to_sec_round",
    "ms_to_sec_trunc",
    "normalize_release_date",
    "part_of_day",
    "safe_percent",
    "to_utc",
]
