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


def test_uncommitted_snapshot_is_invisible(spark, tmp_path):
    """A version directory without _SUCCESS (crashed mid-write, or a
    concurrent writer) must be skipped by read_state — readers only
    ever observe atomically-published snapshots."""
    import os

    rows = [(2024, 1, 1, 10.0)]
    df = spark.createDataFrame(rows, "y int, m int, d int, value double")
    state_dir = str(tmp_path / "state")
    sink = incremental_state_sink(KEYS, "value", state_dir)
    sink(df, 0)
    committed = _canon(read_state(spark, state_dir))
    # simulate a torn write: a bare v=1 directory with garbage, no _SUCCESS
    torn = os.path.join(state_dir, "v=1")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-00000.parquet"), "wb") as f:
        f.write(b"not parquet")
    assert _canon(read_state(spark, state_dir)) == committed
    # a later good batch publishes v=2 over the torn v=1 without issue
    more = spark.createDataFrame(
        [(2024, 1, 1, 5.0)], "y int, m int, d int, value double"
    )
    sink(more, 2)
    d1 = [r for r in read_state(spark, state_dir).collect() if r.d == 1][0]
    assert (d1.n_rows, d1.sum_v) == (2, 15.0)


def test_old_versions_are_pruned(spark, tmp_path):
    """State-dir growth is bounded: after each commit only the newest
    KEEP_VERSIONS snapshots remain on disk, and the latest state is
    still the full merge of every batch."""
    import os

    from spotify_streaming_etl_pipeline_spark.streaming.aggregates import (
        KEEP_VERSIONS,
    )

    state_dir = str(tmp_path / "state")
    sink = incremental_state_sink(KEYS, "value", state_dir)
    n_batches = KEEP_VERSIONS + 3
    for b in range(n_batches):
        df = spark.createDataFrame(
            [(2024, 1, 1, 1.0)], "y int, m int, d int, value double"
        )
        sink(df, b)
    versions = sorted(
        int(n.split("=")[1])
        for n in os.listdir(state_dir)
        if n.startswith("v=")
    )
    assert versions == list(range(n_batches - KEEP_VERSIONS, n_batches))
    d1 = read_state(spark, state_dir).collect()[0]
    assert (d1.n_rows, d1.sum_v) == (n_batches, float(n_batches))


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


import pytest


class _StubValueState:
    """In-memory stand-in for the TWS ValueState handle — records the
    TTL it was created with and every update, so the handler's TTL
    refresh discipline is assertable."""

    def __init__(self, ttl_ms):
        self.ttl_ms = ttl_ms
        self._v = None
        self.n_updates = 0

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.n_updates += 1

    def clear(self):
        self._v = None


class _StubHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        st = _StubValueState(ttlDurationMs)
        self.states[name] = st
        return st


def test_tws_handler_logic_with_stubbed_state():
    """Execute the transformWithStateInPandas dedup handler's logic
    in-sandbox (no protobuf/state-server needed): first sighting of a
    key emits exactly its first row; duplicates emit nothing but
    REFRESH the TTL state; an expired (cleared) key re-admits — the
    exact semantics the protobuf-gated end-to-end parity test pins
    against the legacy form."""
    import pandas as pd

    from spotify_streaming_etl_pipeline_spark.streaming.stateful import (
        DedupStateProcessor,
    )

    proc = DedupStateProcessor(ttl_minutes=60)
    handle = _StubHandle()
    proc.init(handle)
    seen = handle.states["seen"]
    assert seen.ttl_ms == 60 * 60 * 1000  # TTL wired through

    batch = [pd.DataFrame(), pd.DataFrame({"k": [1, 1], "v": [10.0, 11.0]})]
    out = list(proc.handleInputRows((1,), iter(batch), None))
    # first sighting: exactly the first row of the first NONEMPTY chunk
    assert len(out) == 1 and out[0].to_dict("records") == [{"k": 1, "v": 10.0}]
    assert seen.n_updates == 1

    dup = [pd.DataFrame({"k": [1], "v": [12.0]})]
    assert list(proc.handleInputRows((1,), iter(dup), None)) == []
    assert seen.n_updates == 2  # duplicate sighting refreshed the TTL

    seen.clear()  # simulate TTL expiry evicting the state
    out2 = list(proc.handleInputRows((1,), iter(dup), None))
    assert len(out2) == 1 and out2[0].to_dict("records") == [{"k": 1, "v": 12.0}]


def test_tws_processor_subclasses_real_base():
    """The lazily-mixed class used by dedup_stream_tws must satisfy the
    real API's isinstance contract."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    from spotify_streaming_etl_pipeline_spark.streaming.stateful import (
        _as_stateful_processor,
    )

    proc = _as_stateful_processor(30)
    assert isinstance(proc, StatefulProcessor)
    assert proc._ttl_ms == 30 * 60 * 1000


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


def test_hopping_windows_batch_stream_parity(spark, sf_dir, tmp_path):
    """The hopping-window aggregate produces identical rows whether
    events arrive as one batch frame or drain through a watermarked
    readStream (completing the batch/stream parity set: tumbling and
    session forms are already pinned)."""
    from pyspark.sql import functions as F

    from spotify_streaming_etl_pipeline_spark.functions.scalar import epoch_of
    from spotify_streaming_etl_pipeline_spark.sources.catalog import load_table

    # watermarks require TIMESTAMP (LTZ); cast the NTZ column once so
    # batch and stream run the identical window plan on this session
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("ts"), "event_type"
    )
    ts_type = ev.schema["ts"].dataType

    def hopping(df):
        w = df.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"),
            F.col("event_type"),
        ).agg(F.count(F.lit(1)).cast("long").alias("n"))
        return w.select(
            epoch_of(ts_type, F.col("w.start"), "MILLISECOND").alias(
                "win_start_ms"
            ),
            "event_type",
            "n",
        )

    batch_rows = sorted(map(tuple, hopping(ev).collect()))

    src = str(tmp_path / "events_src")
    ev.write.parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .parquet(src)
        .withWatermark("ts", "1 hour")
    )
    q = (
        hopping(stream)
        .writeStream.format("memory")
        .queryName("hopping_parity")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        map(tuple, spark.sql("select * from hopping_parity").collect())
    )
    assert got == batch_rows and len(batch_rows) > 0


def test_coarser_grains_derive_from_the_day_state(spark, sf_dir):
    """month-from-day and year-from-month rollup_state equal the
    states computed directly from base data — the ladder only ever
    maintains its finest rung."""
    from spotify_streaming_etl_pipeline_spark.operators.incremental import (
        agg_state,
        rollup_state,
    )
    from spotify_streaming_etl_pipeline_spark.sources.catalog import load_table

    ev = _day_grain(load_table(spark, sf_dir, "events"))
    day = agg_state(ev, ["y", "m", "d"], "value")

    def canon(df, keys):
        return sorted(
            tuple(r[k] for k in keys)
            + (r.n_rows, round(r.sum_v, 6), r.min_v, r.max_v)
            for r in df.collect()
        )

    month_direct = agg_state(ev, ["y", "m"], "value")
    assert canon(rollup_state(day, ["y", "m"]), ["y", "m"]) == canon(
        month_direct, ["y", "m"]
    )
    year_direct = agg_state(ev, ["y"], "value")
    assert canon(
        rollup_state(rollup_state(day, ["y", "m"]), ["y"]), ["y"]
    ) == canon(year_direct, ["y"])

def test_prune_counts_only_committed_and_cleans_tmp(spark, tmp_path):
    """Torn (uncommitted) v= directories must not occupy KEEP_VERSIONS
    slots — otherwise the only committed predecessor can be pruned and
    a replayed batch silently resets state — and stale _tmp.v= dirs
    from crashed batches are swept during prune."""
    import os

    from spotify_streaming_etl_pipeline_spark.streaming.aggregates import (
        KEEP_VERSIONS,
    )

    state_dir = str(tmp_path / "state")
    sink = incremental_state_sink(KEYS, "value", state_dir)
    df = spark.createDataFrame(
        [(2024, 1, 1, 1.0)], "y int, m int, d int, value double"
    )
    sink(df, 0)  # the only committed snapshot
    # KEEP_VERSIONS torn dirs with HIGHER versions than the next batch
    # will commit, plus a stale tmp dir from a crashed batch.
    for v in range(10, 10 + KEEP_VERSIONS):
        os.makedirs(os.path.join(state_dir, f"v={v}"))
    os.makedirs(os.path.join(state_dir, "_tmp.v=99"))
    sink(df, 1)  # commit v=1; prune runs
    names = set(os.listdir(state_dir))
    # committed snapshots survive; torn dirs and stale tmp are gone
    assert "v=0" in names and "v=1" in names
    assert not any(n.startswith("_tmp.") for n in names)
    assert not any(n == f"v={v}" for v in range(10, 10 + KEEP_VERSIONS)
                   for n in names)
    # state is the merge of both batches, not a reset
    d1 = read_state(spark, state_dir).collect()[0]
    assert (d1.n_rows, d1.sum_v) == (2, 2.0)
