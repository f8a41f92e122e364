

def test_overwrite_partitions_replaces_only_written_partitions(spark, tmp_path):
    from pyspark.sql import functions as F

    from spotify_streaming_etl_pipeline_spark.operators.maintenance import (
        overwrite_partitions,
    )

    path = str(tmp_path / "fact")
    base = spark.createDataFrame(
        [(2020, 1, 10.0), (2020, 2, 20.0), (2021, 3, 30.0)],
        "year int, id long, v double",
    )
    base.write.partitionBy("year").parquet(path)

    # restate ONLY 2020 with corrected rows
    fixed = spark.createDataFrame(
        [(2020, 1, 11.0), (2020, 9, 99.0)], "year int, id long, v double"
    )
    overwrite_partitions(fixed, path, ["year"])

    got = sorted(
        map(tuple, spark.read.parquet(path).select("year", "id", "v").collect())
    )
    # 2020 fully replaced (old id=2 gone), 2021 untouched
    assert got == [(2020, 1, 11.0), (2020, 9, 99.0), (2021, 3, 30.0)]

    # idempotent: re-running the same restatement changes nothing
    overwrite_partitions(fixed, path, ["year"])
    again = sorted(
        map(tuple, spark.read.parquet(path).select("year", "id", "v").collect())
    )
    assert again == got


def test_compaction_recovers_from_crash_residue(spark, tmp_path):
    """Review finding r6: a crash between the two swap renames leaves
    the live dir ABSENT and the data retired under .compact_old_* —
    the next compaction must restore it, not report 0 files."""
    import os
    import shutil

    from spotify_streaming_etl_pipeline_spark.operators.maintenance import (
        compact_parquet,
        parquet_file_stats,
    )

    path = str(tmp_path / "t")
    spark.range(100).repartition(6).write.parquet(path)
    n_before = spark.read.parquet(path).count()
    # simulate the crash window: live dir renamed aside, promotion lost
    old = str(tmp_path / ".compact_old_t")
    os.rename(path, old)
    assert not os.path.isdir(path)
    compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert spark.read.parquet(path).count() == n_before
    assert not os.path.isdir(old)
    # stale tmp residue is swept too
    tmp = str(tmp_path / ".compact_tmp_t")
    os.makedirs(tmp)
    compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert not os.path.isdir(tmp)


def test_compaction_refuses_non_leaf_partition_dir(spark, tmp_path):
    """Compacting a dir that still contains key=value subdirs would
    flatten the nested layout — must raise, and compact_partitioned
    must keep working on true leaves."""
    import pytest

    from spotify_streaming_etl_pipeline_spark.operators.maintenance import (
        compact_parquet,
    )

    root = str(tmp_path / "t2")
    spark.range(50).selectExpr("id", "id % 2 as y").write.partitionBy(
        "y"
    ).parquet(root)
    with pytest.raises(ValueError, match="leaf"):
        compact_parquet(spark, root)
