"""Bigram-LM quality scoring semantics."""

from __future__ import annotations

from spotify_streaming_etl_pipeline_spark.llm.lm_score import bigram_lm_scores


def test_corpus_typical_text_outscores_word_salad(spark):
    # "the cat sat" repeats across docs; doc 4 is salad of rare words.
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat on the rug"),
            (3, "the cat sat quietly"),
            (4, "zyx qwv jkl pqr"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["avg_logprob"] for r in bigram_lm_scores(docs).collect()}
    assert got[1] > got[4]
    assert got[2] > got[4]


def test_short_docs_absent_and_counts_right(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "single"), (3, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["n_bigrams"] for r in bigram_lm_scores(docs).collect()}
    assert rows == {1: 2}  # docs 2 and 3 have no bigrams


def test_model_reuse_is_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(8)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, bigram_lm_scores(docs).collect()))
    b = sorted(map(tuple, bigram_lm_scores(docs).collect()))
    assert a == b
    # identical docs share the identical score
    assert len({t[2] for t in a}) == 1
