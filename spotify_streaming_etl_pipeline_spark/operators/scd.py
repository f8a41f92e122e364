"""Slowly-changing-dimension Type 2: turn a change feed into
[valid_from, valid_to) history rows — the standard dimensional-ETL
operator a warehouse ingest needs (additive family, SURVEY §2.11; the
reference overwrites dims in place, reference scripts/etl/loader.py
upserts, so history is lost there).

Scale shape: ONE shuffle of the feed on the business key, then two
window passes over the same partitioning (lag to find change points,
lead to close intervals). No self-joins, no global sort; each key's
history lives in one task, which holds for any real dimension (rows
per key ≪ partition size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_collapse(
    feed: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Collapse a (key, ts, attr) change feed into SCD-2 intervals.

    Consecutive feed rows with an unchanged ``attr_col`` merge into one
    interval; a change opens a new row whose ``valid_from`` is the
    change's timestamp and whose ``valid_to`` is the NEXT change's
    timestamp (NULL while current). ``tiebreak_col`` makes the ordering
    total when timestamps collide (feeds with at-least-once delivery).

    Returns (key, attr, valid_from, valid_to, is_current, version) with
    ``version`` numbering a key's intervals from 1 in time order.
    """
    order = [F.col(ts_col).asc()]
    keep = [key_col, ts_col, attr_col]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
        keep.append(tiebreak_col)
    w = Window.partitionBy(key_col).orderBy(*order)

    changes = (
        feed.select(*keep)
        .withColumn("_prev", F.lag(attr_col).over(w))
        .withColumn("_rn", F.row_number().over(w))
    )
    # NULL-safe change test. The first row is detected by row_number,
    # NOT by `prev IS NULL` — a NULL attr following a NULL attr must
    # merge, and `prev IS NULL` cannot tell that apart from row one.
    changes = changes.filter(
        (F.col("_rn") == 1) | ~F.col("_prev").eqNullSafe(F.col(attr_col))
    )

    return changes.select(
        F.col(key_col),
        F.col(attr_col),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
        F.row_number().over(w).cast("long").alias("version"),
    )
