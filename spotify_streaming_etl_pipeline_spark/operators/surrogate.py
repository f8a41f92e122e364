"""Deterministic surrogate-key assignment (SURVEY §2.8 F23).

Postgres ``serial`` gives stable dense ids across incremental loads
(reference docs/sql/core_ddl.sql:5,25,34,68,80,90,111). Spark's
``monotonically_increasing_id`` is neither dense nor stable, so the
engine assigns ``row_number() OVER (ORDER BY natural_key) + max(existing)``
— deterministic given the natural key, dense, append-safe.

Scale note: a global row_number is a single-partition sort of ONLY the
new rows (dims grow by small increments per load), not of the whole
table — acceptable even at 100 TB fact scale because dims are small.
For fact-sized surrogate keys prefer the natural-key/composite form or
``monotonically_increasing_id`` (the reference's fact stream_id is only
ever consumed by count(*)-style aggregates — SURVEY §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_surrogate_key(
    new_rows: DataFrame,
    key_name: str,
    order_by: list[str],
    existing_max: int = 0,
) -> DataFrame:
    w = Window.orderBy(*[F.col(c).asc_nulls_last() for c in order_by])
    return new_rows.withColumn(
        key_name, (F.row_number().over(w) + F.lit(existing_max)).cast("long")
    )


def current_max_key(existing: DataFrame | None, key_name: str) -> int:
    if existing is None:
        return 0
    row = existing.agg(F.max(key_name).alias("m")).collect()[0]
    return int(row["m"]) if row["m"] is not None else 0
