"""As-of (temporal nearest-match) join.

The reference engine has no as-of operator (its analytics are bucketed
by calendar period, reference docs/sql/dm_ddl.sql), but any
event-stream warehouse eventually needs "attach the most recent prior
observation": purchase → last click before it, stream event → price at
event time. Spark has no built-in as-of join either, so this is the
composition path: a tagged UNION of both inputs followed by one
window pass per key — ``last(payload, ignorenulls=True)`` over rows up
to the current one carries the right side's latest values forward onto
each left row.

Scale shape: ONE shuffle of (left ∪ right) on the join key plus a
within-partition sort on the timestamp — identical cost to the
sort-merge join Spark would plan for an equi-join of the same inputs,
with no range explosion and no per-row Python. Skewed keys are covered
by AQE the same way any single-key shuffle is. This beats the naive
``left.join(right, key).filter(r_ts <= l_ts)`` + argmax plan, which
materializes every (left, right) pair per key before pruning
(quadratic in per-key row count; lethal on 100 TB event tables).

For the oracle, DuckDB's native ``ASOF JOIN`` computes the same
semantics, which makes the operator hash-checkable end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
) -> DataFrame:
    """For every ``left`` row, attach the payload of the single
    ``right`` row with the greatest ``right_ts <= left_ts``
    (``direction="backward"``, inclusive) or smallest
    ``right_ts >= left_ts`` (``"forward"``) within the same ``on`` key.

    Left rows with no match keep null payload columns (LEFT-join
    semantics). Right payload columns are every column not in ``on`` +
    ``right_ts``; ``right_ts`` itself is attached as ``asof_ts``.
    ``right`` must be unique per (on, right_ts) — pre-aggregate it
    otherwise, or which row's payload survives is nondeterministic.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    payload = [c for c in right.columns if c not in (*on, right_ts)]
    overlap = set(payload) & set(left.columns)
    if overlap:
        raise ValueError(f"right payload columns collide with left: {sorted(overlap)}")
    reserved = {"asof_ts", "_asof_t", "_side", "_r", "_c"}
    bad = reserved & (set(left.columns) | set(right.columns))
    if bad:
        # Chained as-of joins re-feed asof_ts as a left column; the
        # reserved-name clash must fail HERE with a clear message, not
        # three operators later with an ambiguous-column error.
        raise ValueError(
            f"columns {sorted(bad)} collide with asof_join's reserved "
            "names — rename them (e.g. alias a prior join's asof_ts) "
            "before chaining"
        )

    from pyspark.sql.types import StructField, StructType

    ts_type = right.schema[right_ts].dataType
    r_struct = StructType(
        [StructField("asof_ts", ts_type)]
        + [StructField(c, right.schema[c].dataType) for c in payload]
    )

    # The right row travels as ONE struct, carried atomically by a
    # single last(ignorenulls=True): per-column carries would mix
    # payload fields from DIFFERENT right rows whenever the matched
    # row holds a NULL in some payload column (the carry would skip
    # back to an older row for just that column — chimera rows).
    # NULL-ts right rows are dropped up front: a missing observation
    # time matches nothing (DuckDB ASOF agrees).
    l_tagged = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("_asof_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_struct).alias("_r"),
        *[F.col(c) for c in left.columns if c not in (*on,)],
    )
    r_tagged = right.filter(F.col(right_ts).isNotNull()).select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_asof_t"),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(right_ts).alias("asof_ts"), *[F.col(c) for c in payload]
        ).alias("_r"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in (*on,)
        ],
    )
    combined = l_tagged.unionByName(r_tagged)

    # Ordering invariants (both directions): right(_side=0) sorts
    # before left(_side=1) at EQUAL timestamps, so the inclusive
    # rows-so-far window sees same-instant matches — the scan
    # direction flips with the timestamp sort, and _side asc is the
    # correct inclusion order in BOTH modes (do not "flip" it).
    # NULL-ts left rows sort FIRST in both modes so no right row can
    # precede them: they keep LEFT-join null payloads instead of
    # absorbing whatever sorted nearby.
    if direction == "backward":
        order = [F.col("_asof_t").asc_nulls_first(), F.col("_side").asc()]
    else:
        order = [F.col("_asof_t").desc_nulls_first(), F.col("_side").asc()]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    carried = combined.withColumn(
        "_c", F.last("_r", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("_side") == 1).select(
        *on,
        *[c for c in left.columns if c not in (*on,)],
        *[F.col(f"_c.{c}").alias(c) for c in ("asof_ts", *payload)],
    )
