"""Scalar column-expression library (SURVEY.md §2.8, F1-F23).

Every row-level cleaning function the reference implements in Python
(reference scripts/etl/transformer.py:13-159) or Postgres SQL becomes a
*native column expression* here — JVM-side, whole-stage-codegen
friendly, no Python UDFs. Semantics notes pin the Postgres/Python
behaviors the reference relies on (truncating int division, half-up
rounding, NULLIF guards).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_TZ = "Europe/Moscow"


def from_utc(ts: Column | str, tz: str = DEFAULT_TZ) -> Column:
    """F1: ``ts AT TIME ZONE 'UTC' AT TIME ZONE tz`` — UTC instant to
    naive wall-clock (reference scripts/etl/transformer.py:279)."""
    return F.from_utc_timestamp(ts, tz)


def to_utc(ts: Column | str, tz: str = DEFAULT_TZ) -> Column:
    """F1 inverse — naive wall-clock back to UTC instant for delta
    comparison (reference scripts/connectors/db_manager.py:144-146)."""
    return F.to_utc_timestamp(ts, tz)


def safe_percent(numer: Column, denom: Column, scale: int = 1) -> Column:
    """F3: ``round(n / NULLIF(d, 0) * 100, scale)`` — NULL (not error)
    on zero denominator (reference scripts/etl/transformer.py:289)."""
    return F.round(numer / F.nullif(denom, F.lit(0)) * 100, scale)


def ms_to_sec_trunc(ms: Column | str) -> Column:
    """F4: Postgres integer division ``ms / 1000`` truncates toward
    zero (reference scripts/etl/transformer.py:283,314)."""
    col = F.col(ms) if isinstance(ms, str) else ms
    return F.floor(col.cast("long") / 1000).cast("long")


def ms_to_sec_round(ms: Column | str) -> Column:
    """F5: Python ``int(round(ms/1000))`` (reference transformer.py:45).
    Spark round is HALF_UP vs Python's HALF_EVEN; differs only when
    ms % 500 == 0 and ms % 1000 != 0 — documented drift, pinned in
    tests."""
    return F.round((F.col(ms) if isinstance(ms, str) else ms) / 1000, 0).cast("long")


def date_id(d: Column) -> Column:
    """F19: smart integer key yyyymmdd
    (reference docs/sql/dim_date_populate.sql:5-7)."""
    return (F.year(d) * 10000 + F.month(d) * 100 + F.dayofmonth(d)).cast("long")


def minute_of_day(ts: Column) -> Column:
    """F19: ``time_id`` = minute-of-day 0..1439
    (reference docs/sql/dim_time_populate.sql:15-16)."""
    return (F.hour(ts) * 60 + F.minute(ts)).cast("long")


def is_weekend(d: Column) -> Column:
    """F15: ISODOW in (6,7) (reference docs/sql/dim_date_populate.sql:16).
    Spark ``weekday`` is 0=Monday, so weekend is weekday >= 5."""
    return F.weekday(d) >= 5


def part_of_day(hour: Column) -> Column:
    """F15: morning/afternoon/evening/night buckets
    (reference docs/sql/dim_time_populate.sql:7-12)."""
    return (
        F.when((hour >= 6) & (hour < 12), F.lit("morning"))
        .when((hour >= 12) & (hour < 18), F.lit("afternoon"))
        .when((hour >= 18) & (hour < 23), F.lit("evening"))
        .otherwise(F.lit("night"))
    )


def normalize_release_date(rd: Column, precision: Column) -> Column:
    """F13: precision-based release-date padding
    (reference scripts/etl/transformer.py:132-159):
    '0000...' -> 1900-01-01; precision 'year' -> rd-01-01;
    'month' -> rd-01; else rd as-is. Returns DateType (null on junk)."""
    normalized = (
        F.when(rd.isNull(), F.lit(None).cast("string"))
        .when(rd.startswith("0000"), F.lit("1900-01-01"))
        .when(precision == "year", F.concat(rd, F.lit("-01-01")))
        .when(precision == "month", F.concat(rd, F.lit("-01")))
        .otherwise(rd)
    )
    return F.to_date(normalized, "yyyy-MM-dd")


_NTZ_EPOCH = "1970-01-01 00:00:00"


def epoch_of(dtype, c: Column, unit: str) -> Column:
    """Session-timezone-PROOF epoch extraction ('MILLISECOND' |
    'MICROSECOND') that dispatches on the column's bound type.

    ``unix_millis/unix_micros`` only accept TIMESTAMP, and casting
    TIMESTAMP_NTZ to TIMESTAMP interprets the wall time in the SESSION
    zone — correct under this package's UTC-pinned sessions but silently
    shifted on a caller's non-UTC session (the driver runs queries on
    ITS session, not ours). For NTZ inputs we therefore use pure
    wall-clock arithmetic against the NTZ epoch — no zone anywhere in
    the expression; TZ inputs keep the native unix_* functions."""
    from pyspark.sql.types import TimestampNTZType

    if unit not in ("MILLISECOND", "MICROSECOND"):
        raise ValueError(
            f"epoch_of unit must be 'MILLISECOND' or 'MICROSECOND', got {unit!r}"
        )
    if isinstance(dtype, TimestampNTZType):
        return F.timestamp_diff(
            unit, F.lit(_NTZ_EPOCH).cast("timestamp_ntz"), c
        )
    return F.unix_millis(c) if unit == "MILLISECOND" else F.unix_micros(c)
