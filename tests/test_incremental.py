"""Mergeable aggregate state semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_streaming_etl_pipeline_spark.operators.incremental import (
    agg_state,
    merge_states,
)


def _rows(spark, vals):
    return spark.createDataFrame(vals, "k long, v double")


def test_merge_equals_full_recompute_any_split(spark):
    data = [(i % 3, float(i * 7 % 13)) for i in range(300)]
    full = agg_state(_rows(spark, data), ["k"], "v")
    want = sorted(map(tuple, full.collect()))
    for cut in (1, 150, 299):
        prev = agg_state(_rows(spark, data[:cut]), ["k"], "v")
        delta = agg_state(_rows(spark, data[cut:]), ["k"], "v")
        got = sorted(map(tuple, merge_states(prev, delta, ["k"]).collect()))
        assert got == want, f"cut={cut}"


def test_one_sided_keys_pass_through(spark):
    prev = agg_state(_rows(spark, [(1, 5.0)]), ["k"], "v")
    delta = agg_state(_rows(spark, [(2, 7.0)]), ["k"], "v")
    got = {r["k"]: (r["n_rows"], r["sum_v"]) for r in merge_states(prev, delta, ["k"]).collect()}
    assert got == {1: (1, 5.0), 2: (1, 7.0)}


def test_merge_is_associative_across_three_batches(spark):
    b1, b2, b3 = [(1, 1.0), (2, 2.0)], [(1, 3.0)], [(2, 4.0), (1, 5.0)]
    s = lambda d: agg_state(_rows(spark, d), ["k"], "v")  # noqa: E731
    left = merge_states(merge_states(s(b1), s(b2), ["k"]), s(b3), ["k"])
    right = merge_states(s(b1), merge_states(s(b2), s(b3), ["k"]), ["k"])
    assert sorted(map(tuple, left.collect())) == sorted(map(tuple, right.collect()))


def test_delta_plan_scans_only_delta_partition(spark, sf_dir):
    """The merge never rescans history: its plan reads the prev STATE
    (a tiny table) plus the delta rows only — pinned by asserting the
    pushed-down filter on the delta side's scan."""
    from spotify_streaming_etl_pipeline_spark.sources.catalog import load_table

    o = load_table(spark, sf_dir, "orders").withColumn(
        "ym", (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("long")
    )
    prev_state = agg_state(o.filter(F.col("ym") < 199701), ["ym"], "o_totalprice")
    # materialize the snapshot as a real table, as production would
    prev_pdf = prev_state.collect()
    prev = spark.createDataFrame(prev_pdf, prev_state.schema)
    delta = agg_state(o.filter(F.col("ym") >= 199701), ["ym"], "o_totalprice")
    plan = merge_states(prev, delta, ["ym"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1, plan  # only the delta reads orders
