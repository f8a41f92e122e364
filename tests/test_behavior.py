"""Funnel / cohort semantics on constructed frames + plan-shape pins."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from spotify_streaming_etl_pipeline_spark.plans.behavior import (
    cohort_retention,
    funnel_conversion,
    funnel_times,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(int(u), dt.datetime(2020, m, d, h), t) for u, m, d, h, t in rows],
        "user_id long, ts timestamp, event_type string",
    )


def test_funnel_requires_strict_step_order(spark):
    rows = [
        # u1: full ordered funnel
        (1, 1, 1, 0, "view"),
        (1, 1, 1, 1, "click"),
        (1, 1, 1, 2, "purchase"),
        # u2: clicked BEFORE first view -> stops at view
        (2, 1, 1, 1, "click"),
        (2, 1, 2, 0, "view"),
        (2, 1, 1, 2, "purchase"),
        # u3: view then purchase, no click -> stops at view
        (3, 1, 1, 0, "view"),
        (3, 1, 1, 5, "purchase"),
        # u4: never viewed -> counted nowhere
        (4, 1, 1, 0, "click"),
        (4, 1, 1, 1, "purchase"),
    ]
    out = {
        r["step"]: (r["n_users"], r["pct_of_first"])
        for r in funnel_conversion(_ev(spark, rows)).collect()
    }
    assert out["view"] == (3, 100.0)
    assert out["click"] == (1, 33.33)
    assert out["purchase"] == (1, 33.33)


def test_funnel_later_click_rescues_purchase(spark):
    # u1's purchase comes after a click that itself follows the view,
    # even though an earlier (pre-view) click exists.
    rows = [
        (1, 1, 1, 1, "click"),
        (1, 1, 2, 0, "view"),
        (1, 1, 2, 1, "click"),
        (1, 1, 2, 2, "purchase"),
    ]
    per_user = funnel_times(_ev(spark, rows)).collect()[0]
    assert per_user["t1"] == dt.datetime(2020, 1, 2, 0)
    assert per_user["t2"] == dt.datetime(2020, 1, 2, 1)
    assert per_user["t3"] == dt.datetime(2020, 1, 2, 2)


def test_cohort_retention_offsets(spark):
    rows = [
        # u1: first active Jan, returns Mar -> offsets 0 and 2
        (1, 1, 5, 0, "view"),
        (1, 3, 5, 0, "view"),
        # u2: first active Mar only -> offset 0 in Mar cohort
        (2, 3, 1, 0, "click"),
        # u1 twice in the same month dedups
        (1, 1, 6, 0, "click"),
    ]
    got = {
        (r["cohort_ym"], r["month_offset"]): r["n_users"]
        for r in cohort_retention(_ev(spark, rows)).collect()
    }
    assert got == {(202001, 0): 1, (202001, 2): 1, (202003, 0): 1}


def test_funnel_single_shuffle_window_chain(spark, sf_dir):
    """The three chained min-windows share the user_id partitioning:
    exactly ONE hash Exchange of the events table feeds all Window
    operators (the rest of the plan is single-partition aggregation)."""
    from spotify_streaming_etl_pipeline_spark.sources.catalog import load_table

    plan = funnel_times(load_table(spark, sf_dir, "events"))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_cohort_two_shuffles(spark, sf_dir):
    """Window on user_id + final grid aggregate: two hash Exchanges,
    no more (no pre-distinct shuffle)."""
    from spotify_streaming_etl_pipeline_spark.sources.catalog import load_table

    plan = cohort_retention(load_table(spark, sf_dir, "events"))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_rolling_revenue_time_range_semantics(spark):
    import datetime as dt

    from pyspark.sql import Window

    rows = [
        # cust 1: days 1, 3, 3 (tie), 20 (outside any prior frame)
        (1, 1, dt.datetime(2020, 1, 1), 10.0),
        (2, 1, dt.datetime(2020, 1, 3), 20.0),
        (3, 1, dt.datetime(2020, 1, 3), 30.0),
        (4, 1, dt.datetime(2020, 1, 20), 40.0),
        # cust 2: exactly 7 days apart -> day 8 still includes day 2
        (5, 2, dt.datetime(2020, 1, 2), 1.0),
        (6, 2, dt.datetime(2020, 1, 8), 2.0),
        (7, 2, dt.datetime(2020, 1, 9), 4.0),  # day 2 now out of range
    ]
    o = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp, o_totalprice double"
    )
    day = F.unix_date(F.col("o_orderdate").cast("date")).cast("long")
    w = Window.partitionBy("o_custkey").orderBy(day).rangeBetween(-6, Window.currentRow)
    got = {
        r["o_orderkey"]: (r["rev"], r["n"])
        for r in o.select(
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("rev"),
            F.count(F.lit(1)).over(w).alias("n"),
        ).collect()
    }
    # same-day ties share one frame value (RANGE, not ROWS)
    assert got[2] == (60.0, 3) and got[3] == (60.0, 3)
    assert got[1] == (10.0, 1)
    assert got[4] == (40.0, 1)          # 17-day gap resets the frame
    assert got[6] == (3.0, 2)           # day 8 - 6 = day 2 inclusive
    assert got[7] == (6.0, 2)           # day 9 frame starts day 3


def test_rolling_revenue_single_shuffle(spark, sf_dir):
    from spotify_streaming_etl_pipeline_spark.plans.behavior import rolling_revenue_7d

    plan = (
        rolling_revenue_7d(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_fuzzy_pairs_blocked_no_cartesian(spark, sf_dir):
    from spotify_streaming_etl_pipeline_spark.operators.fuzzy import fuzzy_pairs
    from spotify_streaming_etl_pipeline_spark.sources.catalog import load_table

    pairs = fuzzy_pairs(load_table(spark, sf_dir, "part"), "p_name")
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_pairs_semantics(spark):
    from spotify_streaming_etl_pipeline_spark.operators.fuzzy import fuzzy_pairs

    df = spark.createDataFrame(
        [("red bolt",), ("ted bolt",), ("red hammer",), ("red bolt",)],
        "p_name string",
    )
    got = sorted(map(tuple, fuzzy_pairs(df, "p_name").collect()))
    # duplicates collapse; cross-block ('red hammer') never compared
    assert got == [("red bolt", "ted bolt", 1)]


def test_fuzzy_pairs_hot_block_exclusion(spark):
    """max_block_size applies entity-resolution EXCLUSION semantics:
    a planted oversized block (a blocking key with no discriminative
    signal) leaves the comparison space entirely; small blocks keep
    identical pairs through the explode form, and a non-firing cap is
    byte-identical to the unguarded join form."""
    from spotify_streaming_etl_pipeline_spark.operators.fuzzy import fuzzy_pairs

    hot = [(f"name{i:03d} widget",) for i in range(50)]  # one 50-block
    cold = [("red bolt",), ("ted bolt",), ("red hammer",)]
    df = spark.createDataFrame(hot + cold, "p_name string")
    capped = sorted(
        map(tuple, fuzzy_pairs(df, "p_name", max_block_size=10).collect())
    )
    assert capped == [("red bolt", "ted bolt", 1)]  # widget block gone
    unfired = sorted(
        map(tuple, fuzzy_pairs(df, "p_name", max_block_size=100).collect())
    )
    full = sorted(map(tuple, fuzzy_pairs(df, "p_name").collect()))
    assert unfired == full
    assert ("red bolt", "ted bolt", 1) in full
    assert any(a.endswith("widget") for a, _, _ in full)  # join form kept them


def test_fuzzy_pairs_null_block_key_agrees_across_plan_forms(spark):
    """A block_fn returning null means 'no block' in BOTH plan forms:
    the equi-join drops null keys implicitly, so the capped collect_set
    path must drop them explicitly too — null-keyed rows never pair."""
    from pyspark.sql import functions as F

    from spotify_streaming_etl_pipeline_spark.operators.fuzzy import fuzzy_pairs

    df = spark.createDataFrame(
        [("red bolt",), ("ted bolt",), ("stray",), ("strays",)],
        "p_name string",
    )

    def nullable_block(c):
        # single-token names get a NULL blocking key
        return F.when(F.size(F.split(c, " ")) > 1,
                      F.element_at(F.split(c, " "), -1))

    join_form = sorted(map(tuple, fuzzy_pairs(
        df, "p_name", block_fn=nullable_block).collect()))
    capped_form = sorted(map(tuple, fuzzy_pairs(
        df, "p_name", block_fn=nullable_block, max_block_size=10).collect()))
    assert join_form == capped_form == [("red bolt", "ted bolt", 1)]


def test_session_funnel_requires_same_session(spark):
    """A purchase in a LATER session than its view/click must not
    count, even though the cross-session funnel would count it."""
    import datetime as dt

    from spotify_streaming_etl_pipeline_spark.plans.behavior import (
        session_funnel as _sf,  # noqa: F401 - query fn needs sf_dir
    )

    # build via the registered logic on a tiny in-memory table: write
    # it to parquet so the query's load_table can read it? Simpler:
    # replicate the operator inline through funnel-on-session windows.
    rows = [
        # u1: view+click+purchase within one session -> full funnel
        (1, dt.datetime(2020, 1, 1, 10, 0), "view", 1),
        (1, dt.datetime(2020, 1, 1, 10, 5), "click", 2),
        (1, dt.datetime(2020, 1, 1, 10, 10), "purchase", 3),
        # u2: view+click in session 1, purchase 2 hours later
        (2, dt.datetime(2020, 1, 1, 10, 0), "view", 4),
        (2, dt.datetime(2020, 1, 1, 10, 5), "click", 5),
        (2, dt.datetime(2020, 1, 1, 12, 30), "purchase", 6),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(f"{d}/events.parquet")
        got = _sf(spark, d).collect()[0]
    assert got["n_sessions"] == 3  # u1 x1, u2 x2
    assert got["n_view"] == 2
    assert got["n_click"] == 2
    assert got["n_purchase"] == 1  # only u1's same-session purchase


def test_grouping_sets_single_expand(spark, sf_dir):
    """Three grouping sets in ONE aggregate: a single Expand + a single
    hash Exchange, never a self-union of three scans."""
    from spotify_streaming_etl_pipeline_spark.plans.behavior import (
        grouping_sets_agg,
    )

    plan = (
        grouping_sets_agg(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Expand") == 1, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("FileScan parquet") == 1, plan
