"""TF-IDF weighting and cosine-pair semantics."""

from __future__ import annotations

import math

from spotify_streaming_etl_pipeline_spark.llm.tfidf import (
    tfidf_cosine_pairs,
    tfidf_posting,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_identical_docs_have_cosine_one(spark):
    d = _docs(
        spark,
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta epsilon")],
    )
    pairs = tfidf_cosine_pairs(d, threshold=0.5, max_doc_freq=None).collect()
    assert [(r["doc_a"], r["doc_b"], r["cosine"]) for r in pairs] == [(1, 2, 1.0)]


def test_disjoint_docs_never_pair(spark):
    d = _docs(spark, [(1, "a b c"), (2, "d e f")])
    assert tfidf_cosine_pairs(d, threshold=0.0001, max_doc_freq=None).count() == 0


def test_weights_match_formula(spark):
    d = _docs(spark, [(1, "x x y"), (2, "x z")])
    w = {
        (r["doc_id"], r["token"]): r["w"]
        for r in tfidf_posting(d).collect()
    }
    idf_x = round(math.log(2 / 2), 4)  # in both docs -> 0.0
    idf_y = round(math.log(2 / 1), 4)
    assert w[(1, "x")] == 2 * idf_x
    assert w[(1, "y")] == 1 * idf_y
    assert w[(2, "z")] == 1 * idf_y


def test_df_cap_drops_ubiquitous_tokens(spark):
    # "common" is in every doc; with cap=2 it leaves the posting, so
    # docs sharing ONLY it cannot pair.
    d = _docs(
        spark,
        [(1, "common only1"), (2, "common only2"), (3, "common only3")],
    )
    assert tfidf_cosine_pairs(d, threshold=0.0001, max_doc_freq=2).count() == 0
    # uncapped, the shared token carries idf ln(3/3)=0 -> dot 0 -> no
    # pair either, but via weight, not via absence:
    posting = tfidf_posting(d, max_doc_freq=None).collect()
    assert any(r["token"] == "common" and r["w"] == 0.0 for r in posting)


def test_pair_plan_has_no_cartesian(spark, sf_dir):
    from spotify_streaming_etl_pipeline_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = (
        tfidf_cosine_pairs(docs, threshold=0.9)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # The pair stage must be an EQUI-join on the token (the nested
    # loops in the printout are all the cached posting's 1-row n_docs
    # broadcast, repeated per cache consumer).
    import re

    assert re.search(
        r"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin) \[token", plan
    ), plan
    # posting persisted, built once (AQE may label the cache stage)
    assert "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan
