"""Staging lifecycle (S8/S9/P4) and session-window operator tests."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from spotify_streaming_etl_pipeline_spark.operators import staging
from spotify_streaming_etl_pipeline_spark.streaming.ingest import (
    read_history_stream,
    session_windows,
)


def _staged(spark):
    return spark.createDataFrame(
        [
            ("u1", "d1", False),
            ("u2", "d2", True),
            ("u3", "d3", None),
        ],
        "uri: string, raw_data: string, is_processed: boolean",
    )


def test_unprocessed_includes_null_flags(spark):
    out = staging.unprocessed(_staged(spark)).collect()
    assert {r["uri"] for r in out} == {"u1", "u3"}


def test_mark_processed_sets_only_given_keys(spark):
    keys = spark.createDataFrame([("u1",), ("u3",)], "uri: string")
    out = {
        r["uri"]: r["is_processed"]
        for r in staging.mark_processed(_staged(spark), keys, "uri").collect()
    }
    assert out == {"u1": True, "u2": True, "u3": True}
    # and with disjoint keys, null flag normalizes to False
    keys2 = spark.createDataFrame([("zz",)], "uri: string")
    out2 = {
        r["uri"]: r["is_processed"]
        for r in staging.mark_processed(_staged(spark), keys2, "uri").collect()
    }
    assert out2 == {"u1": False, "u2": True, "u3": False}


def test_delete_processed_then_rewrite_roundtrip(spark, tmp_path):
    path = str(tmp_path / "staging_tracks")
    _staged(spark).write.parquet(path)
    staged = spark.read.parquet(path)
    survivors = staging.delete_processed(staged)
    staging.rewrite_staging(survivors, path)
    after = spark.read.parquet(path)
    assert {r["uri"] for r in after.collect()} == {"u1", "u3"}
    staging.truncate_table(path)
    import os

    assert not os.path.isdir(path)


def test_session_windows_gap_semantics(spark):
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("a", base, 1.0),
        ("a", base + dt.timedelta(minutes=10), 2.0),  # same session
        ("a", base + dt.timedelta(minutes=40), 3.0),  # EXACTLY gap -> merges
        ("a", base + dt.timedelta(minutes=71), 4.0),  # gap + 1min -> new session
        ("b", base, 5.0),
    ]
    df = spark.createDataFrame(rows, "user_id: string, ts: timestamp, value: double")
    out = session_windows(df, key_col="user_id", gap="30 minutes").collect()
    a_sessions = sorted(
        [r for r in out if r["user_id"] == "a"], key=lambda r: r["session_start_ms"]
    )
    # Boundary-exact event merges (closed window end); strictly-larger
    # gap starts a new session — the oracle SQL encodes the same rule.
    assert len(a_sessions) == 2
    assert a_sessions[0]["n_events"] == 3
    assert a_sessions[0]["sum_value"] == 6.0
    # end = last event + gap
    assert (
        a_sessions[0]["session_end_ms"] - a_sessions[0]["session_start_ms"]
        == 70 * 60 * 1000
    )
    assert a_sessions[1]["n_events"] == 1
    assert [r["n_events"] for r in out if r["user_id"] == "b"] == [1]


def test_session_windows_streaming_plan(spark, tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    import json

    from tests.fixtures import history_row

    (raw / "f.json").write_text(json.dumps([history_row()]))
    stream = read_history_stream(spark, str(raw))
    sess = session_windows(
        stream, key_col="platform", gap="30 minutes", watermark="1 hour"
    )
    assert sess.isStreaming
    assert "session_start_ms" in sess.columns


def test_stateful_dedup_across_microbatches(spark, tmp_path):
    """applyInPandasWithState cross-batch dedup: with one file per
    micro-batch, a key reappearing in a later batch is dropped and the
    first-seen row survives."""
    import json

    from spotify_streaming_etl_pipeline_spark.streaming.stateful import (
        run_dedup_to_memory,
    )
    from tests.fixtures import history_row

    d = tmp_path / "raw"
    d.mkdir()
    (d / "a_first.json").write_text(
        json.dumps(
            [
                history_row(spotify_track_uri="spotify:track:1", ms_played=111),
                history_row(spotify_track_uri="spotify:track:2", ms_played=222),
            ]
        )
    )
    (d / "b_second.json").write_text(
        json.dumps(
            [
                history_row(spotify_track_uri="spotify:track:2", ms_played=999),  # dup key
                history_row(spotify_track_uri="spotify:track:3", ms_played=333),
            ]
        )
    )
    # The file source orders micro-batches by modification time, not
    # name — pin distinct mtimes so "first file" is deterministic.
    import os
    import time as time_mod

    now = time_mod.time()
    os.utime(d / "a_first.json", (now - 100, now - 100))
    os.utime(d / "b_second.json", (now, now))

    from spotify_streaming_etl_pipeline_spark.schemas import HISTORY_SCHEMA

    stream = (
        spark.readStream.schema(HISTORY_SCHEMA)
        .option("multiLine", "true")
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    q = run_dedup_to_memory(stream, ["spotify_track_uri"], "dedup_out")
    q.awaitTermination(120)
    out = spark.table("dedup_out").collect()
    by_key = {r["spotify_track_uri"]: r["ms_played"] for r in out}
    assert len(out) == 3  # one row per distinct key
    assert by_key["spotify:track:2"] == 222  # first-seen wins (file a)
    assert set(by_key) == {"spotify:track:1", "spotify:track:2", "spotify:track:3"}


def test_epoch_queries_are_session_timezone_proof(spark, sf_dir):
    """The driver runs queries on ITS session, not ours — epoch
    emission from TIMESTAMP_NTZ must not read the session timezone.
    Same SparkContext, second session with a hostile zone: results
    must be identical to the UTC session's."""
    import __spark_entry__ as entry

    qs = entry.queries()
    s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", "America/New_York")
    for name in ("user_sessions", "asof_click_attribution"):
        utc_rows = sorted(map(tuple, qs[name](spark, sf_dir).collect()))
        est_rows = sorted(map(tuple, qs[name](s2, sf_dir).collect()))
        assert est_rows == utc_rows, f"{name} shifts with session timezone"


def test_epoch_of_rejects_unknown_unit(spark):
    """A typo'd unit must raise, not silently fall back to microseconds."""
    import pytest as _pytest

    from pyspark.sql.types import TimestampType

    from spotify_streaming_etl_pipeline_spark.functions.scalar import epoch_of
    from pyspark.sql import functions as F

    with _pytest.raises(ValueError, match="MILLISECOND"):
        epoch_of(TimestampType(), F.col("ts"), "MILLIS")
