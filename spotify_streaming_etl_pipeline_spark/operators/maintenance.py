"""Table maintenance: small-file compaction for parquet directories.

Incremental appends (the writer's conflict-ignore path, streaming
foreachBatch micro-batches) accumulate many small part files; at lake
scale the file count — not the byte count — becomes the scan
bottleneck (one scheduler task + one footer read per file, and object
stores throttle LIST/GET). Table formats solve this with OPTIMIZE /
rewrite-data-files compactions; for plain parquet the same operation
is a read → repartition-to-target-size → atomic swap rewrite.

The rewrite is data-preserving by construction (one job reads, one
writes, the swap is a rename) and keeps the existing partition
columns: compaction runs per partition directory, so a 100 TB table
compacts incrementally — only partitions whose file count drifted,
never the whole table.
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
    count (or the old one when already compact). The rewrite goes to a
    sibling temp dir first, then swaps — readers launched after the
    swap see only the new listing, mirroring writer._overwrite_parquet_safe.
    """
    n_files, total_bytes = parquet_file_stats(path)
    n_target = max(1, -(-total_bytes // target_file_bytes))  # ceil
    if n_files < min_files_to_compact or n_files <= n_target:
        return n_files
    df = spark.read.parquet(path)
    tmp = f"{path}__tmp_compact"
    # coalesce, not repartition: narrowing to fewer files needs no
    # shuffle — each output task reads a run of input files.
    df.coalesce(n_target).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    spark.catalog.refreshByPath(path)
    return parquet_file_stats(path)[0]
