"""The REST enrichment exposed as a Spark 4 Python Data Source
(sources/restsource.py): partitioned fetch, success + dead-letter
rows in one frame, factory-resolved fetch callables."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from spotify_streaming_etl_pipeline_spark.sources.restsource import (
    RestEnrichmentDataSource,
)

# importable on executors (local mode shares the interpreter; on a
# real cluster this module ships with the package)
TRUTH = {
    f"uri:{i}": {"uri": f"uri:{i}", "name": f"artist {i}"} for i in range(7)
}


def fake_fetch(batch):
    # uri:3 is unknown -> the API returns null for it (quarantine path)
    return {"artists": [TRUTH.get(u) for u in batch]}


def make_fetch():
    return fake_fetch


make_fetch.__rest_factory__ = True


def _read(spark, uris, fetch_path, per_partition=2):
    spark.dataSource.register(RestEnrichmentDataSource)
    return (
        spark.read.format("rest_enrichment")
        .option("uris", json.dumps(uris))
        .option("entity", "artists")
        .option("fetch", fetch_path)
        .option("uris_per_partition", str(per_partition))
        .option("batch_size", "2")
        .load()
    )


def test_rest_source_reads_successes_and_dead_letters(spark):
    uris = [f"uri:{i}" for i in range(5)] + ["uri:99"]  # 99 -> null
    df = _read(spark, uris, "tests.test_restsource:fake_fetch")
    rows = {r.uri: r for r in df.collect()}
    assert set(rows) == set(uris)
    ok = [r for r in rows.values() if r.error_reason is None]
    dead = [r for r in rows.values() if r.error_reason is not None]
    assert len(ok) == 5 and len(dead) == 1
    assert dead[0].uri == "uri:99"
    assert dead[0].error_reason == "API returned null"
    payload = json.loads(rows["uri:2"].raw_data)
    assert payload["name"] == "artist 2"


def test_rest_source_partitions_the_uri_list(spark):
    uris = [f"uri:{i}" for i in range(6)]
    df = _read(spark, uris, "tests.test_restsource:fake_fetch", per_partition=2)
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 6


def test_rest_source_resolves_fetch_factories(spark):
    uris = ["uri:0", "uri:1"]
    df = _read(spark, uris, "tests.test_restsource:make_fetch")
    assert df.filter(F.col("error_reason").isNull()).count() == 2


def test_rest_source_reads_uris_from_parquet_path(spark, tmp_path):
    """uris_path: the URI feed rides parquet, partitions are planned
    from footer metadata (one per row group — the staging layout sets
    fetch parallelism, and no row group is ever read twice), and the
    scan output matches the inline-option form exactly — the
    no-driver-side-list scale path."""
    uris = [f"uri:{i}" for i in range(6)] + ["uri:99"]
    staged = str(tmp_path / "uris")
    spark.createDataFrame([(u,) for u in uris], "uri string").repartition(
        3
    ).write.parquet(staged)
    spark.dataSource.register(RestEnrichmentDataSource)
    df = (
        spark.read.format("rest_enrichment")
        .option("uris_path", staged)
        .option("entity", "artists")
        .option("fetch", "tests.test_restsource:fake_fetch")
        .load()
    )
    assert df.rdd.getNumPartitions() == 3  # one per staged row group
    rows = {r.uri: r for r in df.collect()}
    inline = {
        r.uri: r
        for r in _read(
            spark, uris, "tests.test_restsource:fake_fetch"
        ).collect()
    }
    assert set(rows) == set(inline) == set(uris)
    for u in uris:
        assert (rows[u].raw_data, rows[u].error_reason) == (
            inline[u].raw_data,
            inline[u].error_reason,
        )


def test_rest_source_streams_the_feed_incrementally(spark, tmp_path):
    """readStream on the REST source drains the URI feed across
    microbatches (offset = feed index) and lands both successes and
    dead letters; a second availableNow run from the same checkpoint
    re-reads nothing."""
    uris = [f"uri:{i}" for i in range(5)] + ["uri:99"]
    spark.dataSource.register(RestEnrichmentDataSource)

    import time

    def drain(expect):
        stream = (
            spark.readStream.format("rest_enrichment")
            .option("uris", json.dumps(uris))
            .option("entity", "artists")
            .option("fetch", "tests.test_restsource:fake_fetch")
            .option("uris_per_batch", "2")
            .load()
        )
        rows: list = []

        def sink(bdf, _bid):
            rows.extend(bdf.collect())

        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            deadline = time.time() + 120
            while time.time() < deadline:
                if len(rows) >= expect:
                    time.sleep(2)  # settle pass so an over-read would show
                    break
                time.sleep(0.5)
        finally:
            q.stop()
        return rows

    got = drain(len(uris))
    assert sorted(r.uri for r in got) == sorted(uris)
    assert [r.uri for r in got if r.error_reason is not None] == ["uri:99"]
    # restart from the same checkpoint: feed exhausted, nothing re-read
    got2 = drain(0)
    assert len(got2) == 0
