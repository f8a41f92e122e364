"""Unit semantics for plans/quality.py: constructed-input checks for
the FK audit, triangle census, and BPE pair counts; invariant checks
for gap fill and RFM; a plan pin for the EXISTS→LEFT SEMI shape.
(End-to-end value parity vs DuckDB is in test_oracle_parity.py.)"""

from __future__ import annotations

from datetime import date

from pyspark.sql import functions as F

from spotify_streaming_etl_pipeline_spark.plans import quality


def _write(df, path):
    df.coalesce(1).write.mode("overwrite").parquet(str(path))


def test_fk_violations_counts_orphan_rows_and_keys(spark, tmp_path):
    _write(
        spark.createDataFrame(
            [(1, 10), (2, 10), (3, 99), (4, 99), (5, None)],
            "o_orderkey long, o_custkey long",
        ),
        tmp_path / "orders.parquet",
    )
    _write(
        spark.createDataFrame([(10,)], "c_custkey long"),
        tmp_path / "customer.parquet",
    )
    edges = (
        ("orders.o_custkey->customer", "orders", "o_custkey",
         "customer", "c_custkey", True),
    )
    row = quality.fk_violations(spark, str(tmp_path), edges).collect()[0]
    assert row.n_child_rows == 5
    # 99 (x2) and the NULL are orphans — NOT EXISTS semantics
    assert row.n_orphan_rows == 3
    assert row.n_orphan_keys == 2  # keys 99 and NULL


def test_fk_integrity_clean_on_testdata(spark, sf_dir):
    rows = quality.fk_integrity(spark, sf_dir).collect()
    assert len(rows) == 7
    assert all(r.n_orphan_rows == 0 for r in rows), rows


def test_order_priority_semi_plan_is_left_semi(spark, sf_dir):
    plan = quality.order_priority_semi(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    # the non-equi shipdate predicate must ride the hash join, not a
    # nested loop
    assert "CartesianProduct" not in plan


def test_copurchase_triangles_constructed_triangle(spark, tmp_path):
    # parts (1,2), (2,3), (1,3) each co-occur in 2 orders → 3 edges,
    # 1 triangle; pair (1,4) co-occurs once → thinned out by support 2.
    rows = []
    for ok, parts in [
        (100, [1, 2]), (101, [1, 2]),
        (102, [2, 3]), (103, [2, 3]),
        (104, [1, 3]), (105, [1, 3]),
        (106, [1, 4]),
    ]:
        rows += [(ok, p) for p in parts]
    _write(
        spark.createDataFrame(rows, "l_orderkey long, l_partkey long"),
        tmp_path / "lineitem.parquet",
    )
    out = quality.copurchase_triangles(spark, str(tmp_path)).collect()[0]
    assert (out.n_nodes, out.n_edges, out.n_triangles) == (3, 3, 1)


def test_cap_basket_size_drops_only_oversized_orders(spark):
    # order 1: planted 500-item bot basket; orders 2, 3: normal
    rows = [(1, p) for p in range(500)] + [(2, 7), (2, 8), (3, 7), (3, 8)]
    op = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    capped = quality.cap_basket_size(op, max_items=64)
    assert {
        r.l_orderkey for r in capped.select("l_orderkey").distinct().collect()
    } == {2, 3}
    assert capped.count() == 4  # normal baskets pass through untouched


def test_copurchase_edges_bounded_under_planted_giant_basket(spark):
    # a 200-item bot basket would emit C(200,2)=19900 pairs from ONE
    # key unguarded; the guard excludes it entirely, so only the pair
    # supported by the two normal orders survives.
    rows = [(99, p) for p in range(200)]
    for ok in (1, 2):
        rows += [(ok, 10), (ok, 11)]
    op = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    e = quality.copurchase_edges(op, min_support=2).collect()
    assert [(r.pa, r.pb) for r in e] == [(10, 11)]


def test_copurchase_edges_guard_is_noop_under_cap(spark):
    # every basket under the cap → guarded build == unguarded build
    rows = []
    for ok, parts in [(1, [1, 2, 3]), (2, [1, 2]), (3, [2, 3]), (4, [1, 3])]:
        rows += [(ok, p) for p in parts]
    op = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    guarded = quality.copurchase_edges(op, min_support=2, with_support=True)
    raw = quality.copurchase_edges(
        op, min_support=2, with_support=True, max_items=None
    )
    assert sorted(map(tuple, guarded.collect())) == sorted(map(tuple, raw.collect()))
    assert sorted(map(tuple, guarded.collect())) == [(1, 2, 2), (1, 3, 2), (2, 3, 2)]


def test_monthly_gap_fill_spine_is_dense_and_cum_monotone(spark, sf_dir):
    rows = quality.monthly_gap_fill(spark, sf_dir).orderBy("month_start").collect()
    months = [date.fromisoformat(r.month_start) for r in rows]
    # dense: consecutive months, no holes in the spine itself
    for a, b in zip(months, months[1:]):
        assert (b.year - a.year) * 12 + b.month - a.month == 1
    # the filter threshold is chosen so at least one month has no rows
    assert any(r.n_orders == 0 for r in rows)
    assert all(r.revenue == 0.0 for r in rows if r.n_orders == 0)
    cums = [r.cum_revenue for r in rows]
    assert cums == sorted(cums)


def test_rfm_scores_partition_all_customers(spark, sf_dir):
    from spotify_streaming_etl_pipeline_spark.sources.catalog import load_table

    seg = quality.rfm_segments(spark, sf_dir).collect()
    for r in seg:
        for s in (r.r_score, r.f_score, r.m_score):
            assert 1 <= s <= 4
    n_cust = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey").distinct().count()
    )
    assert sum(r.n_customers for r in seg) == n_cust


def test_bpe_pair_counts_constructed_corpus(spark, tmp_path):
    _write(
        spark.createDataFrame(
            [(1, "abab ab", "en", "s", 7), (2, "ab", "en", "s", 2)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ),
        tmp_path / "documents.parquet",
    )
    out = {
        r.pair: r.pair_count
        for r in quality.bpe_pair_counts(spark, str(tmp_path)).collect()
    }
    # word freqs: 'abab'×1 (pairs ab,ba,ab), 'ab'×2 (pair ab)
    assert out == {"ab": 4, "ba": 1}


def test_disjunctive_filter_plan_broadcasts_filtered_part(spark, sf_dir):
    plan = (
        quality.disjunctive_filter_revenue(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_idle_rich_customers_plan_is_left_anti(spark, sf_dir):
    df = quality.idle_rich_customers(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    rows = df.collect()
    assert rows and all(r.n_customers > 0 for r in rows)


def test_dedup_funnel_identities(spark, sf_dir):
    from spotify_streaming_etl_pipeline_spark.plans import llm_evals

    r = llm_evals.dedup_funnel_summary(spark, sf_dir).collect()[0]
    assert r.n_near_removed == r.n_clustered_docs - r.n_clusters
    assert r.n_final <= r.n_unique_content <= r.n_docs
    assert r.n_final >= r.n_unique_content - r.n_near_removed


def test_local_supplier_revenue_asia_only_and_no_sort_merge(spark, sf_dir):
    df = quality.local_supplier_revenue(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan  # at gate scale every edge broadcasts
    rows = df.collect()
    assert rows and all(r.revenue > 0 for r in rows)
    from spotify_streaming_etl_pipeline_spark.sources.catalog import load_table

    asia = (
        load_table(spark, sf_dir, "nation")
        .join(
            load_table(spark, sf_dir, "region").filter(
                F.col("r_name") == "ASIA"
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .count()
    )
    assert len(rows) <= asia  # one row per Asian nation at most


def test_copurchase_reach_bfs_semantics(spark, sf_dir):
    rows = quality.copurchase_reach(spark, sf_dir).collect()
    by_node = {r.node: r.hops for r in rows}
    # the seed itself is reached at depth 0 and is the smallest node
    seeds = [n for n, h in by_node.items() if h == 0]
    assert seeds == [min(by_node)]
    assert all(0 <= h <= 3 for h in by_node.values())
    # BFS frontier property: some node sits at depth 1 if any edge
    # leaves the seed
    assert 1 in by_node.values()


def test_market_basket_lift_agrees_with_raw_probabilities(spark, tmp_path):
    # 4 orders: parts 1,2 always together (lift = N/(s1*s2) = 4/(2*2)=1? no:
    # both=2, s1=s2=2, N=4 -> lift = 2*4/(2*2) = 2.0); part 3 rides along
    rows = []
    for ok, parts in [(1, [1, 2]), (2, [1, 2]), (3, [3]), (4, [3])]:
        rows += [(ok, p) for p in parts]
    _write(
        spark.createDataFrame(rows, "l_orderkey long, l_partkey long"),
        tmp_path / "lineitem.parquet",
    )
    out = {
        (r.pa, r.pb): (r.both_cnt, r.lift)
        for r in quality.market_basket_lift(spark, str(tmp_path)).collect()
    }
    assert out == {(1, 2): (2, 2.0)}


# --- PageRank integer core vs a Python model --------------------------------

from hypothesis import given, settings as hsettings, strategies as st


def _py_pagerank(edges, iters, scale=1_000_000_000_000):
    """Python model of plans/quality.py:pagerank_integer — same integer
    arithmetic (floor divisions, 85/15 damping), symmetric edges."""
    ed = edges + [(v, u) for u, v in edges]
    deg = {}
    for u, _ in ed:
        deg[u] = deg.get(u, 0) + 1
    n = len(deg)
    rk = {u: scale // n for u in deg}
    for _ in range(iters):
        s = {u: 0 for u in deg}
        for u, v in ed:
            s[v] += rk[u] // deg[u]
        rk = {u: (15 * scale) // (100 * n) + (85 * s[u]) // 100 for u in deg}
    return rk


@hsettings(max_examples=5, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)).filter(
            lambda e: e[0] < e[1]
        ),
        min_size=1,
        max_size=15,
        unique=True,
    ),
    iters=st.integers(1, 4),
)
def test_pagerank_integer_matches_python_model(spark, edges, iters):
    from spotify_streaming_etl_pipeline_spark.plans.quality import (
        pagerank_integer,
    )

    ed = spark.createDataFrame(
        edges + [(v, u) for u, v in edges], "u long, v long"
    )
    got = {
        r["u"]: r["rk"] for r in pagerank_integer(ed, iters).collect()
    }
    assert got == _py_pagerank(edges, iters)
