"""Binned interval join: match points into [start, end) intervals
WITHOUT an equi-key — the range join Spark's optimizer cannot plan as
anything but a broadcast-nested-loop / cartesian product (additive
family, SURVEY §2.11).

Technique (the standard bucketed range join, cf. the overlap-interval
join literature and engines that ship it natively): quantize time into
fixed-width buckets, explode each interval into the buckets it covers,
bucket the points, equi-join on the bucket id, then re-apply the exact
range predicate and aggregate per point. Cost is O(points + intervals
× buckets_per_interval) shuffled through ONE hash join — versus the
O(points × intervals) pair stream of the nested-loop plan. Bucket
width tunes the trade: ~interval length ⇒ ≤ (len/width + 1) replicas
per interval.

At 100 TB both sides shuffle on the bucket id, so time-locality also
bounds skew: a bucket holds only that time slice's rows. A hot slice
can additionally salt on the point side (operators/skew.py composes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(epoch_ms: Column, width_ms: int) -> Column:
    return F.floor(epoch_ms / F.lit(width_ms)).cast("long")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ms: str,
    start_ms: str,
    end_ms: str,
    bucket_width_ms: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    start_ms <= point_ms < end_ms (half-open, the streaming-window
    convention). Returns the joined frame with all columns from both
    sides; callers aggregate on top.

    ``how='inner'`` keeps matched pairs; ``'left_missing'`` returns the
    points matching NO interval (the anti form, same binned shape).
    """
    if how not in ("inner", "left_missing"):
        raise ValueError(f"how must be 'inner' or 'left_missing', got {how!r}")
    if bucket_width_ms <= 0:
        # width 0 would divide to NULL buckets (silently empty/inverted
        # results under non-ANSI), negative widths break monotonicity.
        raise ValueError(f"bucket_width_ms must be positive, got {bucket_width_ms}")
    p = points.withColumn("_pb", _bucket(F.col(point_ms), bucket_width_ms))
    # Empty/inverted intervals (end <= start) match nothing under the
    # half-open predicate, but an inverted one would make sequence()
    # count BACKWARD across the whole inversion (a corrupt epoch-0 end
    # explodes ~1M spurious bucket rows) — drop them before exploding,
    # same guard word_ngrams applies to its sequence().
    intervals = intervals.filter(F.col(end_ms) > F.col(start_ms))
    i = intervals.withColumn(
        "_ib",
        F.explode(
            F.sequence(
                _bucket(F.col(start_ms), bucket_width_ms),
                # end is exclusive: a bucket is covered iff the interval
                # reaches past its left edge, so quantize end - 1ms.
                _bucket(F.col(end_ms) - F.lit(1), bucket_width_ms),
            )
        ),
    )
    exact = (F.col(point_ms) >= F.col(start_ms)) & (F.col(point_ms) < F.col(end_ms))
    cond = (F.col("_pb") == F.col("_ib")) & exact
    if how == "inner":
        return p.join(i, cond, "inner").drop("_pb", "_ib")
    return p.join(i, cond, "left_anti").drop("_pb")
