"""Degenerate-input hardening: core operators must return empty (or
identity) results on empty frames, never throw — the backfill-gap /
quiet-day case every production run eventually hits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


@pytest.fixture(scope="module")
def empty_events(spark):
    return spark.createDataFrame(
        [], "event_id long, user_id long, ts timestamp, event_type string"
    )


def test_dedup_family_on_empty_corpus(spark, empty_docs):
    from spotify_streaming_etl_pipeline_spark.llm import dedup

    assert dedup.exact_dedup_groups(empty_docs).count() == 0
    assert dedup.ngram_jaccard_pairs(empty_docs).count() == 0
    assert dedup.minhash_near_dup(empty_docs).count() == 0


def test_tfidf_and_overlap_on_empty_corpus(spark, empty_docs):
    from spotify_streaming_etl_pipeline_spark.llm.overlap import (
        substring_overlap_pairs,
    )
    from spotify_streaming_etl_pipeline_spark.llm.tfidf import tfidf_cosine_pairs

    assert tfidf_cosine_pairs(empty_docs).count() == 0
    assert substring_overlap_pairs(empty_docs).count() == 0


def test_lm_scores_on_empty_corpus(spark, empty_docs):
    from spotify_streaming_etl_pipeline_spark.llm.lm_score import bigram_lm_scores

    assert bigram_lm_scores(empty_docs).count() == 0


def test_behavior_ops_on_empty_events(spark, empty_events):
    from spotify_streaming_etl_pipeline_spark.operators.scd import scd2_collapse
    from spotify_streaming_etl_pipeline_spark.plans.behavior import (
        cohort_retention,
        funnel_times,
    )

    assert funnel_times(empty_events).count() == 0
    assert cohort_retention(empty_events).count() == 0
    assert (
        scd2_collapse(
            empty_events, "user_id", "event_type", tiebreak_col="event_id"
        ).count()
        == 0
    )


def test_interval_join_empty_sides(spark):
    from spotify_streaming_etl_pipeline_spark.operators.rangejoin import (
        interval_join,
    )

    p = spark.createDataFrame([(1, 100)], "pid long, pms long")
    i = spark.createDataFrame([], "iid long, start_ms long, end_ms long")
    assert interval_join(p, i, "pms", "start_ms", "end_ms", 10).count() == 0
    # anti form: with no intervals, every point is "missing"
    missing = interval_join(
        p, i, "pms", "start_ms", "end_ms", 10, how="left_missing"
    )
    assert [r["pid"] for r in missing.collect()] == [1]
    # empty points, real intervals
    p0 = spark.createDataFrame([], "pid long, pms long")
    i1 = spark.createDataFrame([(1, 0, 10)], "iid long, start_ms long, end_ms long")
    assert interval_join(p0, i1, "pms", "start_ms", "end_ms", 10).count() == 0


def test_cdc_empty_feed_is_identity(spark):
    from spotify_streaming_etl_pipeline_spark.operators.cdc import apply_cdc

    base = spark.createDataFrame([(1, 2.0)], "k long, v double")
    ch = spark.createDataFrame([], "k long, op string, seq long, v double")
    got = sorted(map(tuple, apply_cdc(base, ch, ["k"], "seq").collect()))
    assert got == [(1, 2.0)]
    # empty base, real feed: inserts land, deletes no-op
    b0 = spark.createDataFrame([], "k long, v double")
    ch2 = spark.createDataFrame(
        [(5, "I", 1, 9.0), (6, "D", 1, None)], "k long, op string, seq long, v double"
    )
    got2 = sorted(map(tuple, apply_cdc(b0, ch2, ["k"], "seq").collect()))
    assert got2 == [(5, 9.0)]


def test_profile_and_histogram_on_empty_table(spark):
    from spotify_streaming_etl_pipeline_spark.operators.profile import (
        profile_table,
    )

    df = spark.createDataFrame([], "a long, b string")
    rows = {r["col_name"]: r for r in profile_table(df).collect()}
    assert rows["a"]["n_rows"] == 0 and rows["a"]["n_distinct"] == 0
    assert rows["a"]["null_pct"] is None  # 0/0 -> null, not a crash


def test_incremental_merge_with_empty_delta(spark):
    from spotify_streaming_etl_pipeline_spark.operators.incremental import (
        agg_state,
        merge_states,
    )

    prev = agg_state(
        spark.createDataFrame([(1, 5.0)], "k long, v double"), ["k"], "v"
    )
    delta = agg_state(spark.createDataFrame([], "k long, v double"), ["k"], "v")
    got = merge_states(prev, delta, ["k"]).collect()
    assert [(r["k"], r["n_rows"], r["sum_v"]) for r in got] == [(1, 1, 5.0)]


def test_bpe_train_on_empty_and_single_char_corpus(spark):
    from spotify_streaming_etl_pipeline_spark.llm.bpe import bpe_train

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert bpe_train(empty, n_merges=3).count() == 0
    # single-char words have no adjacent pairs -> zero merges, no crash
    chars = spark.createDataFrame([(1, "a b c a b")], "doc_id long, text string")
    assert bpe_train(chars, n_merges=3).count() == 0


def test_pagerank_on_empty_edges(spark):
    from spotify_streaming_etl_pipeline_spark.plans.quality import (
        pagerank_integer,
    )

    ed = spark.createDataFrame([], "u long, v long")
    assert pagerank_integer(ed, 2).count() == 0


def test_ann_join_with_empty_query_table(spark):
    from spotify_streaming_etl_pipeline_spark.llm.similarity import ann_join

    corpus = spark.createDataFrame(
        [(1, [1.0] * 64), (2, [0.5] * 64)], "vec_id long, embedding array<float>"
    )
    empty_q = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert ann_join(empty_q, corpus, k=3).count() == 0
    # and an empty corpus yields no neighbors rather than an error
    assert ann_join(corpus, empty_q, k=3).count() == 0


def test_admission_with_empty_batch(spark):
    from spotify_streaming_etl_pipeline_spark.streaming.admission import (
        admit_batch,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert admit_batch(empty, None).count() == 0
    corpus = spark.createDataFrame(
        [(1, "some corpus document with enough words to shingle")],
        "doc_id long, text string",
    )
    assert admit_batch(empty, corpus).count() == 0
