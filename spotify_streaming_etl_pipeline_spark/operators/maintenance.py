"""Table maintenance: small-file compaction for parquet directories.

Incremental appends (the writer's conflict-ignore path, streaming
foreachBatch micro-batches) accumulate many small part files; at lake
scale the file count — not the byte count — becomes the scan
bottleneck (one scheduler task + one footer read per file, and object
stores throttle LIST/GET). Table formats solve this with OPTIMIZE /
rewrite-data-files compactions; for plain parquet the same operation
is a read → repartition-to-target-size → atomic swap rewrite.

The rewrite is data-preserving for a quiesced table (one job reads,
one writes, rename-aside → promote → retire; see compact_parquet's
single-writer contract) and keeps the existing partition columns:
compaction runs per partition directory, so a 100 TB table compacts
incrementally — only partitions whose file count drifted, never the
whole table.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

TARGET_FILE_BYTES = 128 * 1024 * 1024


def parquet_file_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet dir (recursive,
    ignores _SUCCESS/_metadata sidecars)."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
    min_files_to_compact: int = 2,
) -> int:
    """Rewrite ``path`` into ~target-sized files; returns the new file
    count (or the old one when already compact).

    Single-writer operation: the caller must ensure no concurrent
    appender targets ``path`` between the read job and the swap — a
    part file appended in that window is lost when the old directory
    is retired (same contract as Delta/Iceberg OPTIMIZE, which take a
    table lock for the commit). Streaming appenders should pause, or
    compaction should run on partitions past their append horizon
    (e.g. closed year= partitions).

    The rewrite goes to sibling work dirs whose basenames start with
    an underscore, so Spark/Hadoop path filters hide them from any
    read of the partitioned table root while the rewrite (or crash
    residue) exists, and partition inference never sees them. The swap
    itself is two renames, not one atomic operation: the old dir is
    renamed aside, the new one promoted, then the old one removed — a
    crash between the renames leaves the data recoverable under
    ``_compact_old_*`` rather than half-deleted.
    """
    n_files, total_bytes = parquet_file_stats(path)
    n_target = max(1, -(-total_bytes // target_file_bytes))  # ceil
    if n_files < min_files_to_compact or n_files <= n_target:
        return n_files
    df = spark.read.parquet(path)
    parent, base = os.path.split(os.path.normpath(path))
    tmp = os.path.join(parent, f"_compact_tmp_{base}")
    old = os.path.join(parent, f"_compact_old_{base}")
    # coalesce, not repartition: narrowing to fewer files needs no
    # shuffle — each output task reads a run of input files.
    df.coalesce(n_target).write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    spark.catalog.refreshByPath(path)
    return parquet_file_stats(path)[0]
