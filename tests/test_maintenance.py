

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
