"""Units for the materialized MinHash dedup index (llm/dedup_index.py):
batch-partitioned layout, idempotent retry semantics, and equivalence
with the in-flight incremental path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spotify_streaming_etl_pipeline_spark.llm import dedup, dedup_index


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "completely different words entirely here now"),
        (3, "the quick brown fox jumps over the lazy dog"),
        (4, "maritime navigation law concerning separate vessels"),
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_index_retry_is_idempotent(spark, corpus, tmp_path):
    path = str(tmp_path / "idx")
    dedup_index.write_dedup_index(corpus, path, batch_id=0)
    once = dedup_index.load_dedup_index(spark, path)
    n_post, n_bands = once["posting"].count(), once["bands"].count()
    # retried append of the SAME batch replaces its partition
    dedup_index.write_dedup_index(corpus, path, batch_id=0)
    again = dedup_index.load_dedup_index(spark, path)
    assert again["posting"].count() == n_post
    assert again["bands"].count() == n_bands


def test_index_batches_union_and_check_matches_inflight(spark, corpus, tmp_path):
    path = str(tmp_path / "idx")
    dedup_index.write_dedup_index(
        corpus.filter(F.col("doc_id") <= 2), path, batch_id=0
    )
    dedup_index.write_dedup_index(
        corpus.filter(F.col("doc_id") > 2), path, batch_id=1
    )
    loaded = dedup_index.load_dedup_index(spark, path)
    assert loaded["bands"].select("doc_id").distinct().count() == 4

    batch = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog"),
         (101, "fresh novel content nobody has seen before")],
        "doc_id: long, text: string",
    )
    via_index = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup_index.check_batch_against_index(
            spark, batch, path, threshold=0.9
        ).collect()
    }
    inflight = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup.minhash_incremental(
            batch, corpus, threshold=0.9
        ).collect()
    }
    assert via_index == inflight
    assert {(a, b) for a, b, _ in via_index} == {(1, 100), (3, 100)}


def test_index_check_applies_hot_bucket_guard(spark, tmp_path):
    """An indexed boilerplate mega-bucket thins to its representative
    on the check path (default LSH_MAX_BUCKET; explicit small cap
    here), so one batch doc collides with ONE corpus rep, not all
    members."""
    clone = "alpha bravo charlie delta echo foxtrot golf hotel india"
    corpus = spark.createDataFrame(
        [(100 + i, clone) for i in range(20)], "doc_id: long, text: string"
    )
    path = str(tmp_path / "idx")
    dedup_index.write_dedup_index(corpus, path, batch_id=0)
    batch = spark.createDataFrame([(500, clone)], "doc_id: long, text: string")
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_index.check_batch_against_index(
            spark, batch, path, threshold=0.9, max_bucket_size=8
        ).collect()
    }
    assert capped == {(100, 500)}
