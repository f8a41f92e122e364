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
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-phase skew-safe aggregation: per-key counts and sums."""
    sums = sums or []
    phase1 = (
        df.withColumn("_salt", _salt(n_salts))
        .groupBy(*keys, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            *[F.sum(c).alias(f"_sum_{c}") for c in sums],
        )
    )
    aggs = []
    if count_alias:
        aggs.append(F.sum("_cnt").alias(count_alias))
    aggs.extend(F.sum(f"_sum_{c}").alias(f"sum_{c}") for c in sums)
    return phase1.groupBy(*keys).agg(*aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    how: str = "inner",
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side
    across all salts (small grows n_salts-fold — keep it dim-sized)."""
    salts = small.sparkSession.range(n_salts).select(
        F.col("id").cast("int").alias("_salt")
    )
    big_s = big.withColumn("_salt", _salt(n_salts).cast("int"))
    small_s = small.crossJoin(salts)
    return big_s.join(small_s, [*keys, "_salt"], how).drop("_salt")
