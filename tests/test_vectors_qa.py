"""Unit semantics for the embedding-QA queries (plans/vectors_qa.py)
and the expectation report (plans/quality.py)."""

from __future__ import annotations

from spotify_streaming_etl_pipeline_spark.plans import quality, vectors_qa
from spotify_streaming_etl_pipeline_spark.sources.catalog import load_table


def test_embedding_norm_stats_cover_all_vectors(spark, sf_dir):
    rows = vectors_qa.embedding_norm_stats(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vecs for r in rows) == total
    for r in rows:
        assert 0 < r.min_norm <= r.avg_norm <= r.max_norm


def test_label_centroid_distances_complete_and_positive(spark, sf_dir):
    rows = vectors_qa.label_centroid_distances(spark, sf_dir).collect()
    n_labels = (
        load_table(spark, sf_dir, "embeddings")
        .select("label")
        .distinct()
        .count()
    )
    assert len(rows) == n_labels * (n_labels - 1) // 2
    # the synthetic labels are distinct clusters: centroids never collide
    assert all(r.centroid_dist > 0 for r in rows)


def test_expectation_report_flags_real_violation(spark, sf_dir):
    rows = {
        r.check_name: r
        for r in quality.expectation_report(spark, sf_dir).collect()
    }
    assert len(rows) == 6
    # the synthetic data ships some lines before the order date — the
    # suite must FLAG it, not rubber-stamp everything green
    ship = rows["lineitem.shipdate_after_orderdate"]
    assert not ship.passed and ship.n_violations > 0
    for name, r in rows.items():
        if name != "lineitem.shipdate_after_orderdate":
            assert r.passed and r.n_violations == 0, r
        assert r.n_rows > 0
