"""Streaming continuous aggregates: maintain a keyed rollup across
microbatches by MERGING mergeable partial states
(`operators/incremental.py`) — the streaming form of the incremental
day-grain maintenance the batch side proves, and the pattern behind
"continuous aggregate" features (TimescaleDB caggs, Databricks
incremental materialized views).

State model: each microbatch writes a FULL merged snapshot under
``{state_dir}/v={batch_id}`` (overwrite).  Replays of a batch after a
crash rewrite the same version instead of double-merging — foreachBatch
guarantees at-least-once with a stable batch_id, and idempotent
overwrite-by-version upgrades that to exactly-once for the state.  The
previous snapshot is looked up as the highest version BELOW the
current batch_id, so a replay also re-reads the same predecessor it
used the first time.

Scale: the snapshot is group-cardinality-sized (days × keys), not
event-sized; each microbatch costs one map-side-combined aggregate of
the delta plus a key-sized merge join.  On a real deployment the
versioned-parquet snapshot becomes a transactional table (Delta/
Iceberg MERGE); the merge algebra is identical.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame

from ..operators.incremental import agg_state, merge_states

_VERSION_RE = re.compile(r"^v=(\d+)$")


def _latest_version_below(state_dir: str, batch_id: int) -> int | None:
    if not os.path.isdir(state_dir):
        return None
    versions = [
        int(m.group(1))
        for name in os.listdir(state_dir)
        if (m := _VERSION_RE.match(name))
    ]
    below = [v for v in versions if v < batch_id]
    return max(below) if below else None


def read_state(spark, state_dir: str, below: int | None = None) -> DataFrame | None:
    """Latest committed snapshot (optionally below a batch id)."""
    v = _latest_version_below(
        state_dir, below if below is not None else 1 << 62
    )
    if v is None:
        return None
    return spark.read.parquet(os.path.join(state_dir, f"v={v}"))


def incremental_state_sink(keys: list[str], value_col: str, state_dir: str):
    """foreachBatch sink maintaining the merged (count, sum, min, max)
    state table for ``keys`` over ``value_col``.  Use with
    ``stream.writeStream.foreachBatch(incremental_state_sink(...))``;
    read the result with ``read_state``."""

    def sink(bdf: DataFrame, batch_id: int) -> None:
        delta = agg_state(bdf, keys, value_col)
        prev = read_state(bdf.sparkSession, state_dir, below=batch_id)
        merged = (
            merge_states(prev, delta, keys) if prev is not None else delta
        )
        merged.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v={batch_id}")
        )

    return sink
