"""Unit invariants for the sketch-evaluation queries
(plans/llm_queries.py: minhash_recall_eval, jaccard_histogram)."""

from __future__ import annotations

from spotify_streaming_etl_pipeline_spark.plans import llm_queries


def test_minhash_recall_eval_confusion_identity(spark, sf_dir):
    r = llm_queries.minhash_recall_eval(spark, sf_dir).collect()[0]
    assert r.tp + r.fn == r.n_exact
    assert r.tp + r.fp == r.n_minhash
    if r.n_minhash:
        assert 0.0 <= r.precision <= 1.0
    if r.n_exact:
        assert 0.0 <= r.recall <= 1.0
    # banded LSH verified by exact jaccard: candidates are a SUBSET of
    # truth-space pairs, so precision is 1 whenever any pair is found
    if r.n_minhash:
        assert r.fp == 0 and r.precision == 1.0


def test_jaccard_histogram_buckets_and_mass(spark, sf_dir):
    rows = llm_queries.jaccard_histogram(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.3 <= r.bucket <= 1.0
        assert r.n_pairs > 0
    high_mass = sum(r.n_pairs for r in rows if r.bucket >= 0.8)
    n_dedup = llm_queries.ngram_jaccard_dedup(spark, sf_dir).count()
    assert high_mass == n_dedup


def test_simhash_recall_eval_confusion_bounds(spark, sf_dir):
    r = llm_queries.simhash_recall_eval(spark, sf_dir).collect()[0]
    assert r.tp <= min(r.n_exact, r.n_simhash)
    if r.n_simhash:
        assert 0.0 <= r.precision <= 1.0
    if r.n_exact:
        assert 0.0 <= r.recall <= 1.0


def test_vocab_coverage_monotone(spark, sf_dir):
    rows = sorted(
        llm_queries.vocab_coverage(spark, sf_dir).collect(),
        key=lambda r: r.vocab_size,
    )
    assert [r.vocab_size for r in rows] == [10, 20, 50]
    pcts = [r.coverage_pct for r in rows]
    assert pcts == sorted(pcts)  # bigger vocab never covers less
    assert 0 < pcts[0] <= pcts[-1] <= 100.0
