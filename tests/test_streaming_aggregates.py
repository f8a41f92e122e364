"""Streaming continuous-aggregate maintenance
(streaming/aggregates.py): multi-microbatch merge equals the batch
recompute, and replaying a batch id is idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_streaming_etl_pipeline_spark.operators.incremental import agg_state
from spotify_streaming_etl_pipeline_spark.sources.catalog import load_table
from spotify_streaming_etl_pipeline_spark.streaming.aggregates import (
    incremental_state_sink,
    read_state,
)

KEYS = ["y", "m", "d"]


def _day_grain(ev):
    return ev.select(
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        "value",
    )


def _canon(df):
    return sorted(
        (r.y, r.m, r.d, r.n_rows, round(r.sum_v, 6), r.min_v, r.max_v)
        for r in df.collect()
    )


def test_multibatch_stream_state_equals_batch_recompute(spark, sf_dir, tmp_path):
    ev = _day_grain(load_table(spark, sf_dir, "events"))
    src = str(tmp_path / "src")
    # several input files → maxFilesPerTrigger=1 forces ≥4 microbatches,
    # so the merge path (not just the first-batch path) is exercised
    ev.repartition(4).write.parquet(src)
    state_dir = str(tmp_path / "state")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            incremental_state_sink(KEYS, "value", state_dir)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    import os

    versions = [n for n in os.listdir(state_dir) if n.startswith("v=")]
    assert len(versions) >= 2, versions  # the merge path actually ran

    final = read_state(spark, state_dir)
    full = agg_state(ev, KEYS, "value")
    assert _canon(final) == _canon(full)


def test_replaying_a_batch_id_is_idempotent(spark, tmp_path):
    rows = [(2024, 1, d, float(v)) for d, v in [(1, 10), (1, 30), (2, 5)]]
    df = spark.createDataFrame(rows, "y int, m int, d int, value double")
    state_dir = str(tmp_path / "state")
    sink = incremental_state_sink(KEYS, "value", state_dir)
    sink(df, 0)
    more = spark.createDataFrame(
        [(2024, 1, 2, 7.0)], "y int, m int, d int, value double"
    )
    sink(more, 1)
    once = _canon(read_state(spark, state_dir))
    # crash-replay of batch 1: same delta, same id → same state, no
    # double count
    sink(more, 1)
    assert _canon(read_state(spark, state_dir)) == once
    d2 = [r for r in read_state(spark, state_dir).collect() if r.d == 2][0]
    assert (d2.n_rows, d2.sum_v) == (2, 12.0)


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


import pytest


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithStateInPandas needs google.protobuf (its state"
    " server speaks protobuf); absent in this sandbox - the TWS form is"
    " exercised wherever protobuf exists",
)
def test_tws_dedup_matches_legacy_dedup(spark, tmp_path):
    """transformWithStateInPandas and applyInPandasWithState dedup
    must admit exactly the same first-row-per-key set across
    microbatches."""
    from spotify_streaming_etl_pipeline_spark.streaming.stateful import (
        dedup_stream,
        dedup_stream_tws,
    )

    rows = [
        (1, "a", 1.0), (2, "b", 2.0), (1, "a", 3.0),
        (3, "c", 4.0), (2, "b", 5.0), (4, "d", 6.0),
    ]
    df = spark.createDataFrame(rows, "k int, name string, v double")
    src = str(tmp_path / "src")
    df.repartition(3).write.parquet(src)

    def drain(maker, name):
        stream = spark.readStream.schema(df.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = (
            maker(stream, ["k"])
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return sorted(
            (r.k,) for r in spark.sql(f"select * from {name}").collect()
        )

    legacy = drain(dedup_stream, "legacy_dedup")
    tws = drain(dedup_stream_tws, "tws_dedup")
    assert legacy == tws == [(1,), (2,), (3,), (4,)]
