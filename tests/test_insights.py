"""Unit semantics for plans/insights.py: sketch error bounds on real
data, constructed-input checks for minhash similarity / transitions /
new-vs-returning, percentile ordering invariants.  (Value parity vs
DuckDB is in test_oracle_parity.py.)"""

from __future__ import annotations

from datetime import datetime

from spotify_streaming_etl_pipeline_spark.plans import insights


def _write(df, path):
    df.coalesce(1).write.mode("overwrite").parquet(str(path))


def test_cms_estimate_is_one_sided(spark, sf_dir):
    rows = insights.heavy_hitters_cms(spark, sf_dir).collect()
    assert rows, "no heavy hitters found"
    # Count-Min never underestimates
    assert all(r.est_count >= r.true_count for r in rows), rows


def test_minhash_source_similarity_identical_and_disjoint(spark, tmp_path):
    docs = [
        (1, "x y z", "en", "A", 5),
        (2, "x y z", "en", "B", 5),
        (3, "q r s", "en", "C", 5),
    ]
    _write(
        spark.createDataFrame(
            docs,
            "doc_id long, text string, lang string, source string, n_chars long",
        ),
        tmp_path / "documents.parquet",
    )
    out = {
        (r.source_a, r.source_b): r.est_jaccard
        for r in insights.source_similarity_minhash(
            spark, str(tmp_path)
        ).collect()
    }
    assert out[("A", "B")] == 1.0  # identical word sets: every slot equal
    assert out[("A", "C")] == 0.0  # disjoint: no slot equal
    assert out[("B", "C")] == 0.0


def test_transition_matrix_constructed_chain(spark, tmp_path):
    ts = [datetime(2024, 1, 1, h) for h in range(4)]
    events = [
        (1, ts[0], 10, "view", 1.0, "{}"),
        (2, ts[1], 10, "click", 1.0, "{}"),
        (3, ts[2], 10, "view", 1.0, "{}"),
        (4, ts[3], 10, "click", 1.0, "{}"),
        (5, ts[0], 20, "view", 1.0, "{}"),
        (6, ts[1], 20, "purchase", 1.0, "{}"),
    ]
    _write(
        spark.createDataFrame(
            events,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ),
        tmp_path / "events.parquet",
    )
    out = {
        (r.from_type, r.to_type): (r.n, r.prob)
        for r in insights.event_transition_matrix(
            spark, str(tmp_path)
        ).collect()
    }
    # user 10: view->click, click->view, view->click; user 20: view->purchase
    assert out[("view", "click")] == (2, 0.6667)
    assert out[("view", "purchase")] == (1, 0.3333)
    assert out[("click", "view")] == (1, 1.0)


def test_monthly_new_vs_returning_constructed(spark, tmp_path):
    events = [
        (1, datetime(2024, 1, 5), 1, "view", 1.0, "{}"),
        (2, datetime(2024, 2, 5), 1, "view", 1.0, "{}"),
        (3, datetime(2024, 2, 6), 2, "view", 1.0, "{}"),
    ]
    _write(
        spark.createDataFrame(
            events,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ),
        tmp_path / "events.parquet",
    )
    out = {
        r.ym: (r.n_users, r.n_new, r.n_returning)
        for r in insights.monthly_new_vs_returning(
            spark, str(tmp_path)
        ).collect()
    }
    assert out[202401] == (1, 1, 0)
    assert out[202402] == (2, 1, 1)


def test_ship_latency_percentiles_ordered(spark, sf_dir):
    rows = insights.ship_latency_percentiles(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.p25 <= r.p50 <= r.p75 <= r.p90
        assert r.n_lines > 0


def test_multi_grain_rollup_single_expand_and_grain_identity(spark, sf_dir):
    df = insights.multi_grain_rollup(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") == 1  # one Expand feeds all three grains
    rows = df.collect()
    years = [r for r in rows if r.m == -1]
    days = [r for r in rows if r.d != -1]
    # the year grain must equal the sum of its day grain
    for y in years:
        assert y.n == sum(r.n for r in days if r.y == y.y)


def test_day_grain_maintains_incrementally(spark, sf_dir):
    """The multi_grain_rollup day grain is exactly the mergeable-state
    shape operators/incremental.py maintains: splitting events at any
    cutoff and merging the two day-grain states equals the full
    recompute."""
    from pyspark.sql import functions as F

    from spotify_streaming_etl_pipeline_spark.operators import incremental
    from spotify_streaming_etl_pipeline_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        "value",
    )
    cutoff = ev.agg(F.expr("percentile(y * 10000 + m * 100 + d, 0.5)")).first()[0]
    key = F.col("y") * 10000 + F.col("m") * 100 + F.col("d")
    old, new = ev.filter(key <= cutoff), ev.filter(key > cutoff)
    keys = ["y", "m", "d"]
    merged = incremental.merge_states(
        incremental.agg_state(old, keys, "value"),
        incremental.agg_state(new, keys, "value"),
        keys,
    )
    full = incremental.agg_state(ev, keys, "value")

    def canon(df):
        return sorted(
            (r.y, r.m, r.d, r.n_rows, round(r.sum_v, 6), r.min_v, r.max_v)
            for r in df.collect()
        )

    assert canon(merged) == canon(full)


def test_props_variant_stats_covers_all_events(spark, sf_dir):
    from spotify_streaming_etl_pipeline_spark.sources.catalog import load_table

    rows = insights.props_variant_stats(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "events").count()
    assert sum(r.n for r in rows) == total
    for r in rows:
        assert r.min_k <= r.max_k
        assert 0 <= r.n_k_ge_50 <= r.n


def test_seasonality_index_averages_to_one(spark, sf_dir):
    rows = insights.seasonality_profile(spark, sf_dir).collect()
    assert {r.month_of_year for r in rows} <= set(range(1, 13))
    mean_idx = sum(r.seasonal_index for r in rows) / len(rows)
    assert abs(mean_idx - 1.0) < 0.05  # indexes center on 1 by construction
    assert all(r.avg_revenue_cents > 0 for r in rows)


def test_benford_digits_complete_and_shares_sum(spark, sf_dir):
    rows = insights.benford_digit_profile(spark, sf_dir).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.observed_pct for r in rows) - 100.0) < 0.5
    # the Benford expectation itself must be the textbook curve
    d1 = [r for r in rows if r.digit == 1][0]
    assert d1.benford_pct == 30.1


def test_gini_bounds_and_concentration_direction(spark, sf_dir):
    r = insights.gini_customer_revenue(spark, sf_dir).collect()[0]
    assert 0.0 <= r.gini < 1.0
    assert r.n_customers > 0 and r.total_cents > 0


def test_zipf_slope_is_negative(spark, sf_dir):
    r = insights.zipf_slope(spark, sf_dir).collect()[0]
    assert r.n_words > 10
    assert r.slope < 0  # frequency falls with rank, always
    assert 0.0 <= r.r2 <= 1.0
