"""Incremental aggregate maintenance: keep a keyed aggregate table up
to date by MERGING the previous snapshot's partial states with the new
rows' partials — never re-scanning history (additive family, SURVEY
§2.11; the reference recomputes its dm.* views from scratch on every
dashboard load).

The algebra is the same one Spark uses internally for partial (map-
side) aggregation: a state (count, sum, min, max) merges by
(+, +, min, max), so `merge(state(old), state(delta)) == state(all)`
exactly. Derived measures (avg = sum/count) and any rounding happen
only at PRESENTATION time — rounding a partial before merging would
bake half-merged values into the state and break the equivalence.

At 100 TB this is the difference between a daily job that scans one
day and one that scans three years. countDistinct is deliberately NOT
in the state: exact distincts don't merge; carry an HLL sketch
(approx_count_distinct's internal state via `hll_sketch_agg` /
`hll_union`) when a distinct measure must be maintained incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_COLS = ("n_rows", "sum_v", "min_v", "max_v")


def agg_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Mergeable per-key state over ``value_col``: (n_rows, sum_v,
    min_v, max_v). This is the table you PERSIST as the snapshot."""
    return df.groupBy(*keys).agg(
        F.count(value_col).cast("long").alias("n_rows"),
        F.sum(value_col).cast("double").alias("sum_v"),
        F.min(value_col).cast("double").alias("min_v"),
        F.max(value_col).cast("double").alias("max_v"),
    )


def merge_states(prev: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """New snapshot = prev ⊕ delta, per key: counts and sums add,
    min/max fold. Keys present on only one side pass through (the
    union handles both directions)."""
    return (
        prev.select(*keys, *STATE_COLS)
        .unionByName(delta.select(*keys, *STATE_COLS))
        .groupBy(*keys)
        .agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum("sum_v").alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )


def rollup_state(state: DataFrame, coarse_keys: list[str]) -> DataFrame:
    """Derive a coarser-grain state table from a finer one by the same
    merge algebra — month from day, year from month — WITHOUT touching
    base data: counts and sums add, min/max fold.  This is why the
    finest grain is the only one a continuous aggregate needs to
    maintain (`streaming/aggregates.py`); every coarser ladder rung is
    a group-cardinality-sized aggregate of the snapshot itself."""
    return state.groupBy(*coarse_keys).agg(
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )
