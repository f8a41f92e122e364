"""Semantics pins for operators/asof.py (union+window as-of join).

The oracle-gate query (plans/extras.py asof_click_attribution) proves
parity with DuckDB's native ASOF JOIN on real data; these tests pin the
boundary semantics on hand-built rows where every edge is visible:
inclusive same-instant match, forward mode, LEFT-join nulls, and the
payload-collision guard.
"""

from __future__ import annotations

from datetime import datetime

import pytest

from spotify_streaming_etl_pipeline_spark.operators.asof import asof_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "p1"),  # matches r@09:00
            (1, _ts("2024-01-01 11:00:00"), "p2"),  # same-instant r@11:00 (inclusive)
            (1, _ts("2024-01-01 08:00:00"), "p3"),  # before all right rows -> null
            (2, _ts("2024-01-01 10:00:00"), "p4"),  # key with no right rows -> null
        ],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:00:00"), 9.0),
            (1, _ts("2024-01-01 11:00:00"), 11.0),
            (1, _ts("2024-01-01 12:00:00"), 12.0),
        ],
        "user_id long, ts timestamp, price double",
    )
    return left, right


def test_backward_inclusive(frames):
    left, right = frames
    out = asof_join(left, right, on=["user_id"])
    by_tag = {r.tag: r for r in out.collect()}
    assert len(by_tag) == 4  # every left row survives exactly once
    assert by_tag["p1"].price == 9.0
    assert by_tag["p2"].price == 11.0  # same-instant matches (<=)
    assert by_tag["p3"].price is None and by_tag["p3"].asof_ts is None
    assert by_tag["p4"].price is None  # key absent from right
    assert by_tag["p1"].asof_ts == _ts("2024-01-01 09:00:00")


def test_forward(frames):
    left, right = frames
    out = asof_join(left, right, on=["user_id"], direction="forward")
    by_tag = {r.tag: r for r in out.collect()}
    assert by_tag["p1"].price == 11.0  # earliest right >= 10:00
    assert by_tag["p2"].price == 11.0  # same-instant matches (>=)
    assert by_tag["p3"].price == 9.0
    assert by_tag["p4"].price is None


def test_left_columns_preserved(frames):
    left, right = frames
    out = asof_join(left, right, on=["user_id"])
    assert set(out.columns) == {"user_id", "ts", "tag", "asof_ts", "price"}
    assert out.count() == left.count()


def test_payload_collision_raises(spark, frames):
    left, right = frames
    bad_right = right.withColumnRenamed("price", "tag")  # collides with left.tag
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, bad_right, on=["user_id"])


def test_bad_direction_raises(frames):
    left, right = frames
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on=["user_id"], direction="nearest")


def test_no_chimera_rows_when_matched_payload_is_null(spark):
    """Review finding r6: the matched right row's payload must be
    carried ATOMICALLY — a NULL in one payload column of the matched
    row must not be backfilled from an older right row."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "p")],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 08:00:00"), 8.0, "a"),
            (1, _ts("2024-01-01 09:00:00"), None, "b"),  # the true match
        ],
        "user_id long, ts timestamp, price double, src string",
    )
    row = asof_join(left, right, on=["user_id"]).collect()[0]
    assert row.asof_ts == _ts("2024-01-01 09:00:00")
    assert row.src == "b"
    assert row.price is None  # NOT 8.0 leaked from the older row


def test_null_timestamps_never_match(spark):
    """NULL observation times compare to nothing: a NULL-ts left row
    keeps null payload (both directions), and a NULL-ts right row is
    never attached to anyone."""
    left = spark.createDataFrame(
        [(1, None, "lnull"), (1, _ts("2024-01-01 10:00:00"), "lreal")],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, None, 666.0), (1, _ts("2024-01-01 09:00:00"), 9.0)],
        "user_id long, ts timestamp, price double",
    )
    for direction in ("backward", "forward"):
        out = {
            r.tag: r
            for r in asof_join(
                left, right, on=["user_id"], direction=direction
            ).collect()
        }
        assert out["lnull"].price is None and out["lnull"].asof_ts is None
        assert out["lreal"].price != 666.0


def test_chained_asof_rejects_reserved_collision(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 09:00:00"))],
        "user_id long, ts timestamp, asof_ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"), 1.0)],
        "user_id long, ts timestamp, price double",
    )
    with pytest.raises(ValueError, match="reserved"):
        asof_join(left, right, on=["user_id"])
