"""Streaming continuous aggregates: maintain a keyed rollup across
microbatches by MERGING mergeable partial states
(`operators/incremental.py`) — the streaming form of the incremental
day-grain maintenance the batch side proves, and the pattern behind
"continuous aggregate" features (TimescaleDB caggs, Databricks
incremental materialized views).

State model: each microbatch writes a FULL merged snapshot to a temp
dir and renames it to ``{state_dir}/v={batch_id}`` (atomic publish;
readers additionally require the _SUCCESS marker, so a torn or
in-flight write is never visible).  Replays of a batch after a
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
import shutil

from pyspark.sql import DataFrame

from ..operators.incremental import agg_state, merge_states

_VERSION_RE = re.compile(r"^v=(\d+)$")

# Snapshots older than the newest KEEP_VERSIONS are pruned after each
# successful commit — bounds state-dir growth at a few snapshots while
# keeping enough history for a replayed batch to find its predecessor.
KEEP_VERSIONS = 3


def _committed(state_dir: str, v: int) -> bool:
    """A snapshot counts only once its _SUCCESS marker exists — a
    crashed-mid-write or concurrently-writing version is invisible to
    readers (no torn parquet directories)."""
    return os.path.isfile(os.path.join(state_dir, f"v={v}", "_SUCCESS"))


def _versions(state_dir: str) -> list[int]:
    if not os.path.isdir(state_dir):
        return []
    return [
        int(m.group(1))
        for name in os.listdir(state_dir)
        if (m := _VERSION_RE.match(name))
    ]


def _latest_version_below(state_dir: str, batch_id: int) -> int | None:
    below = [
        v
        for v in _versions(state_dir)
        if v < batch_id and _committed(state_dir, v)
    ]
    return max(below) if below else None


def read_state(spark, state_dir: str, below: int | None = None) -> DataFrame | None:
    """Latest committed snapshot (optionally below a batch id)."""
    v = _latest_version_below(
        state_dir, below if below is not None else 1 << 62
    )
    if v is None:
        return None
    return spark.read.parquet(os.path.join(state_dir, f"v={v}"))


def publish_snapshot(df: DataFrame, state_dir: str, batch_id: int) -> None:
    """Shared snapshot-publish discipline for every versioned-state
    sink (continuous aggregates, streaming admission): write-temp-
    then-rename so a reader never observes a torn snapshot (the final
    v= directory appears atomically with its _SUCCESS already inside),
    then prune.

    The prune keep-set counts only COMMITTED snapshots — a torn/
    uncommitted v= dir must never occupy a KEEP_VERSIONS slot and
    displace a committed predecessor (worst case the only committed
    snapshot gets pruned and a replayed batch silently resets state
    from prev=None).  Uncommitted v= dirs are garbage by definition,
    as are stale _tmp.v=* dirs left by crashes of other batch ids."""
    final = os.path.join(state_dir, f"v={batch_id}")
    tmp = os.path.join(state_dir, f"_tmp.v={batch_id}")
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    # AQE-sized output files (guide §6): a snapshot inherits whatever
    # partitioning its plan ends with — often dozens of sliver files
    # for a dim-sized state table; the keyless REBALANCE lets AQE
    # coalesce (or split) to advisory-sized files.
    df.hint("rebalance").write.mode("overwrite").parquet(tmp)
    if os.path.isdir(final):
        shutil.rmtree(final)
    os.rename(tmp, final)
    committed = [v for v in _versions(state_dir) if _committed(state_dir, v)]
    keep = set(sorted(committed)[-KEEP_VERSIONS:])
    for v in _versions(state_dir):
        if v not in keep:
            shutil.rmtree(
                os.path.join(state_dir, f"v={v}"), ignore_errors=True
            )
    for name in os.listdir(state_dir):
        if name.startswith("_tmp.v="):
            shutil.rmtree(os.path.join(state_dir, name), ignore_errors=True)


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
        # A replayed batch rewrites the same version from the same
        # predecessor, keeping the state exactly-once.
        publish_snapshot(merged, state_dir, batch_id)

    return sink
