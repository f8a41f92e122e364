"""Skew mitigation: salting utilities (SURVEY §4 scale posture).

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; these helpers are the *explicit* form for the cases AQE can't
fix — a single hot group in an aggregation (one reducer key can't be
split without changing the plan) and a hot key joining a
broadcast-unfriendly side.

- ``salted_agg``: two-phase aggregation — groupBy(keys + salt) partial,
  then groupBy(keys) merge. Any algebraic aggregate (sum/count/min/
  max) decomposes this way; the hot key's rows spread over
  ``n_salts`` reducers in phase one.
- ``salted_join``: replicate the small side once per salt value and
  join on (keys + salt); the big side's hot key fans out over
  ``n_salts`` tasks instead of one straggler.

Salt assignment uses a hash of a uniformly-distributed physical rowid,
so it needs no randomness (deterministic plans re-execute identically
on retry — important for task retries at scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 32


def _salt(n_salts: int) -> Column:
    # monotonically_increasing_id is unique per row within a job ->
    # pmod spreads rows evenly; deterministic per execution plan.
    return F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sums: list[str] | None = None,
    count_alias: str | None = "n",
    mins: list[str] | None = None,
    maxs: list[str] | None = None,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-phase skew-safe aggregation: per-key counts, sums, mins,
    maxs (every algebraic aggregate decomposes as agg-of-partials:
    sum-of-sums, min-of-mins, max-of-maxes)."""
    sums, mins, maxs = sums or [], mins or [], maxs or []
    if not (count_alias or sums or mins or maxs):
        raise ValueError("salted_agg needs at least one aggregate "
                         "(count_alias, sums, mins, or maxs)")
    phase1 = (
        df.withColumn("_salt", _salt(n_salts))
        .groupBy(*keys, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            *[F.sum(c).alias(f"_sum_{c}") for c in sums],
            *[F.min(c).alias(f"_min_{c}") for c in mins],
            *[F.max(c).alias(f"_max_{c}") for c in maxs],
        )
    )
    aggs = []
    if count_alias:
        aggs.append(F.sum("_cnt").alias(count_alias))
    aggs.extend(F.sum(f"_sum_{c}").alias(f"sum_{c}") for c in sums)
    aggs.extend(F.min(f"_min_{c}").alias(f"min_{c}") for c in mins)
    aggs.extend(F.max(f"_max_{c}").alias(f"max_{c}") for c in maxs)
    return phase1.groupBy(*keys).agg(*aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    how: str = "inner",
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side
    across all salts (small grows n_salts-fold — keep it dim-sized).

    Only big-side-preserving joins are valid: the replicated small
    side would emit its unmatched rows once PER SALT, so
    'right'/'full' joins would return n_salts-fold duplicate
    null-padded rows — rejected here rather than silently corrupt."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join supports big-side-preserving joins only "
            f"(inner/left/left_semi/left_anti); got {how!r} — a "
            f"small-side-preserving join over the replicated small side "
            f"would duplicate its unmatched rows n_salts-fold"
        )
    salts = small.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias("_salt")
    )
    big_s = big.withColumn("_salt", _salt(n_salts).cast("int"))
    small_s = small.crossJoin(salts)
    return big_s.join(small_s, [*keys, "_salt"], how).drop("_salt")
