"""SCD Type-2 collapse semantics on constructed feeds."""

from __future__ import annotations

import datetime as dt

from spotify_streaming_etl_pipeline_spark.operators.scd import scd2_collapse


def _feed(spark, rows):
    return spark.createDataFrame(
        [(k, dt.datetime(2021, 1, d, h), a, i) for i, (k, d, h, a) in enumerate(rows)],
        "k long, ts timestamp, attr string, seq long",
    )


def _by_version(rows):
    return sorted(
        ((r["k"], r["version"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"]) for r in rows)
    )


def test_consecutive_duplicates_collapse(spark):
    feed = _feed(
        spark,
        [
            (1, 1, 0, "free"),
            (1, 2, 0, "free"),      # unchanged -> merges
            (1, 3, 0, "premium"),   # change -> new interval
            (1, 4, 0, "free"),      # back again -> third interval
        ],
    )
    got = _by_version(scd2_collapse(feed, "k", "attr", tiebreak_col="seq").collect())
    assert got == [
        (1, 1, "free", dt.datetime(2021, 1, 1), dt.datetime(2021, 1, 3), False),
        (1, 2, "premium", dt.datetime(2021, 1, 3), dt.datetime(2021, 1, 4), False),
        (1, 3, "free", dt.datetime(2021, 1, 4), None, True),
    ]


def test_null_transitions_are_null_safe(spark):
    feed = _feed(
        spark,
        [
            (1, 1, 0, None),
            (1, 2, 0, None),   # NULL after NULL merges (not a change)
            (1, 3, 0, "a"),    # NULL -> value opens
            (1, 4, 0, None),   # value -> NULL opens
        ],
    )
    got = _by_version(scd2_collapse(feed, "k", "attr", tiebreak_col="seq").collect())
    assert [g[1:3] for g in got] == [(1, None), (2, "a"), (3, None)]


def test_same_timestamp_uses_tiebreaker(spark):
    feed = _feed(
        spark,
        [
            (1, 1, 0, "a"),
            (1, 1, 0, "b"),  # same ts; seq orders a before b
        ],
    )
    got = _by_version(scd2_collapse(feed, "k", "attr", tiebreak_col="seq").collect())
    assert [g[1:3] for g in got] == [(1, "a"), (2, "b")]
    assert got[0][4] == got[1][3]  # a's valid_to == b's valid_from


def test_single_shuffle_plan(spark, sf_dir):
    """Both window passes ride ONE hash Exchange on the key."""
    from spotify_streaming_etl_pipeline_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    plan = (
        scd2_collapse(ev, "user_id", "event_type", tiebreak_col="event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_pointintime_skips_zero_length_intervals(spark):
    """Two status changes at the same instant: the first forms a
    zero-length [t, t) interval that no probe timestamp can inhabit —
    the as-of lookup must resolve to the SECOND change."""
    import datetime as dt

    from pyspark.sql import functions as F

    from spotify_streaming_etl_pipeline_spark.operators.asof import asof_join

    t = dt.datetime(2021, 1, 5)
    feed = spark.createDataFrame(
        [
            (1, dt.datetime(2021, 1, 1), "a", 0),
            (1, t, "b", 1),
            (1, t, "c", 2),  # same instant, later tiebreak
        ],
        "k long, ts timestamp, attr string, seq long",
    )
    hist = scd2_collapse(feed, "k", "attr", tiebreak_col="seq")
    hist = hist.filter(
        F.col("valid_to").isNull() | (F.col("valid_from") != F.col("valid_to"))
    ).select("k", "valid_from", "attr", "version")
    probes = spark.createDataFrame([(100, 1, t)], "pid long, k long, ts timestamp")
    got = asof_join(probes, hist, on=["k"], left_ts="ts", right_ts="valid_from").collect()
    assert len(got) == 1
    assert (got[0]["attr"], got[0]["version"]) == ("c", 3)
