"""Binned interval join vs the naive nested-loop model + plan pins."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from spotify_streaming_etl_pipeline_spark.operators.rangejoin import interval_join


def _frames(spark, seed=7, n_points=300, n_intervals=60):
    rng = random.Random(seed)
    pts = [(i, rng.randrange(0, 100_000)) for i in range(n_points)]
    ivs = []
    for j in range(n_intervals):
        s = rng.randrange(-5_000, 95_000)
        ivs.append((j, s, s + rng.randrange(1, 15_000)))
    p = spark.createDataFrame(pts, "pid long, pms long")
    i = spark.createDataFrame(ivs, "iid long, start_ms long, end_ms long")
    return pts, ivs, p, i


def test_matches_naive_model_across_bucket_widths(spark):
    pts, ivs, p, i = _frames(spark)
    expect = sorted(
        (pid, iid) for pid, pms in pts for iid, s, e in ivs if s <= pms < e
    )
    for width in (1_000, 7_919, 15_000, 60_000):
        got = sorted(
            (r["pid"], r["iid"])
            for r in interval_join(
                p, i, "pms", "start_ms", "end_ms", bucket_width_ms=width
            ).collect()
        )
        assert got == expect, f"width={width}"


def test_half_open_boundaries(spark):
    p = spark.createDataFrame([(1, 10), (2, 20)], "pid long, pms long")
    i = spark.createDataFrame([(1, 10, 20)], "iid long, start_ms long, end_ms long")
    got = interval_join(p, i, "pms", "start_ms", "end_ms", 7).collect()
    assert [r["pid"] for r in got] == [1]  # start inclusive, end exclusive


def test_left_missing_is_the_complement(spark):
    pts, ivs, p, i = _frames(spark)
    inside = {
        pid for pid, pms in pts for iid, s, e in ivs if s <= pms < e
    }
    missing = interval_join(
        p, i, "pms", "start_ms", "end_ms", 10_000, how="left_missing"
    )
    assert sorted(r["pid"] for r in missing.collect()) == sorted(
        pid for pid, _ in pts if pid not in inside
    )
    assert missing.columns == ["pid", "pms"]


def test_no_nested_loop_in_plan(spark, sf_dir):
    """The whole point: the registered query must plan as an equi-join
    on the bucket id, never a BroadcastNestedLoopJoin / cartesian."""
    from spotify_streaming_etl_pipeline_spark.plans.behavior import (
        interval_join_binned_query,
    )

    plan = (
        interval_join_binned_query(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_interval_join_guards_degenerate_intervals(spark):
    """Review finding r6: inverted intervals must not fan out a
    backward-counting sequence (a corrupt epoch-0 end would explode
    ~1M spurious bucket rows per bad row), and a non-positive bucket
    width must raise instead of silently matching nothing."""
    import pytest as _pytest

    from spotify_streaming_etl_pipeline_spark.operators.rangejoin import (
        interval_join,
    )

    points = spark.createDataFrame([(1, 5_000_000)], "pid long, t long")
    ivals = spark.createDataFrame(
        [
            (10, 4_000_000, 6_000_000),   # valid: contains the point
            (11, 6_000_000, 6_000_000),   # empty: matches nothing
            (12, 9_000_000, 0),           # inverted: must not explode
        ],
        "iid long, s long, e long",
    )
    out = interval_join(points, ivals, "t", "s", "e", 1_800_000)
    assert [(r.pid, r.iid) for r in out.collect()] == [(1, 10)]
    with _pytest.raises(ValueError, match="bucket_width_ms"):
        interval_join(points, ivals, "t", "s", "e", 0)
