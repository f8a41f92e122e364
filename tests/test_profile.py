"""One-pass table profiler semantics + single-scan plan pin."""

from __future__ import annotations

from spotify_streaming_etl_pipeline_spark.operators.profile import profile_table


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")],
        "k long, s string",
    )
    got = {r["col_name"]: r.asDict() for r in profile_table(df).collect()}
    assert got["k"]["n_rows"] == 4
    assert got["k"]["n_nulls"] == 1
    assert got["k"]["null_pct"] == 25.0
    assert got["k"]["n_distinct"] == 2
    assert (got["k"]["min_str"], got["k"]["max_str"]) == ("1", "2")
    assert got["s"]["n_nulls"] == 1
    assert got["s"]["n_distinct"] == 2
    assert (got["s"]["min_str"], got["s"]["max_str"]) == ("a", "b")


def test_profile_approx_mode_close_to_exact(spark, sf_dir):
    from spotify_streaming_etl_pipeline_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_orderkey", "l_partkey"]
    exact = {
        r["col_name"]: r["n_distinct"]
        for r in profile_table(li, cols, exact_distinct=True).collect()
    }
    approx = {
        r["col_name"]: r["n_distinct"]
        for r in profile_table(li, cols, exact_distinct=False).collect()
    }
    for c in cols:
        assert abs(approx[c] - exact[c]) / exact[c] < 0.1, (c, approx[c], exact[c])


def test_profile_two_scans_no_per_column_loop(spark, sf_dir):
    """Exactly TWO column-pruned scans (plain metrics + the distinct
    agg — deliberately split so neither forces SortAggregate over the
    expanded stream), never a scan per profiled column."""
    from spotify_streaming_etl_pipeline_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    plan = (
        profile_table(li, ["l_orderkey", "l_quantity", "l_returnflag"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan parquet") == 2, plan


def test_equidepth_histogram_balances_buckets(spark):
    from spotify_streaming_etl_pipeline_spark.operators.profile import (
        equidepth_histogram,
    )

    # heavily skewed values: equi-depth still splits ~evenly
    vals = [(float(v),) for v in list(range(100)) + [1000.0] * 100]
    df = spark.createDataFrame(vals, "x double")
    got = {r["bucket"]: r["n"] for r in equidepth_histogram(df, "x", 4).collect()}
    assert sum(got.values()) == 200
    assert max(got.values()) <= 110  # no bucket hoards the hot value's share
    assert len(got) >= 3


def test_equidepth_histogram_no_global_sort(spark, sf_dir):
    from spotify_streaming_etl_pipeline_spark.operators.profile import (
        equidepth_histogram,
    )
    from spotify_streaming_etl_pipeline_spark.sources.catalog import load_table

    o = load_table(spark, sf_dir, "orders").select("o_totalprice")
    plan = (
        equidepth_histogram(o, "o_totalprice")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange rangepartitioning" not in plan, plan  # no ntile sort


def test_profile_handles_awkward_column_names(spark):
    """Review finding r6: columns with spaces/dots/quotes must profile
    (generated stack() identifiers are backtick-quoted)."""
    from spotify_streaming_etl_pipeline_spark.operators.profile import (
        profile_table,
    )

    df = spark.range(3).selectExpr(
        "id as `track name`", "id as `a.b`", "id as `it's`"
    )
    rows = {r["col_name"]: r for r in profile_table(df).collect()}
    assert set(rows) == {"track name", "a.b", "it's"}
    assert rows["a.b"]["n_distinct"] == 3


def test_equidepth_guards_and_null_exclusion(spark):
    import pytest

    from spotify_streaming_etl_pipeline_spark.operators.profile import (
        equidepth_histogram,
    )

    df = spark.createDataFrame(
        [(float(i),) for i in range(8)] + [(None,)] * 3, "v double"
    )
    out = equidepth_histogram(df, "v", n_buckets=2).collect()
    assert sorted(r["bucket"] for r in out) == [0, 1]  # no NULL bucket
    assert sum(r["n"] for r in out) == 8  # nulls excluded from depths
    one = equidepth_histogram(df, "v", n_buckets=1).collect()
    assert len(one) == 1 and one[0]["n"] == 8
    with pytest.raises(ValueError, match="n_buckets"):
        equidepth_histogram(df, "v", n_buckets=0)
