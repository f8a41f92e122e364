"""Model-based scoring units (llm/classify.py): hashed linear
classifier semantics and DSIR importance-weight ordering."""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_streaming_etl_pipeline_spark.llm.classify import (
    dsir_bucket_log_ratios,
    dsir_log_weights,
    hashed_linear_scores,
)
from spotify_streaming_etl_pipeline_spark.llm.text import portable_hash48


def _bucket_of(spark, word: str, n_buckets: int) -> int:
    return (
        spark.range(1)
        .select((portable_hash48(F.lit(word)) % n_buckets).alias("b"))
        .collect()[0]["b"]
    )


def test_hashed_linear_scores_semantics(spark):
    """Known weights on known buckets: a doc of +weight tokens labels
    True, a -weight doc False; repetition does not change the mean
    (length invariance); a token-less doc scores the bare bias."""
    B = 64
    b_good = _bucket_of(spark, "good", B)
    b_bad = _bucket_of(spark, "bad", B)
    rows = [(b, 0) for b in range(B)]
    weights = spark.createDataFrame(rows, "bucket long, wt_m long")
    weights = weights.withColumn(
        "wt_m",
        F.when(F.col("bucket") == b_good, F.lit(250))
        .when(F.col("bucket") == b_bad, F.lit(-250))
        .otherwise(F.col("wt_m")),
    )
    docs = spark.createDataFrame(
        [
            (1, "good good good"),
            (2, "bad bad"),
            (3, "good good good good good good"),  # 2x doc 1
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in hashed_linear_scores(
            docs, weights, bias=0.0, n_buckets=B
        ).collect()
    }
    assert out[1]["label"] is True and out[1]["logit"] == 0.25
    assert out[2]["label"] is False and out[2]["logit"] == -0.25
    assert out[3]["logit"] == out[1]["logit"]  # length-invariant mean
    assert out[4]["n_tokens"] == 0 and out[4]["logit"] == 0.0
    assert out[4]["label"] is False


def test_hashed_linear_scores_sparse_weight_table(spark):
    """Tokens hashing to buckets ABSENT from a sparse model carry
    weight 0 but stay in the denominator (fastText's unseen-feature
    rule) — an inner join would silently drop them from n_tokens."""
    B = 64
    b_good = _bucket_of(spark, "good", B)
    weights = spark.createDataFrame(
        [(b_good, 400)], "bucket long, wt_m long"  # ONLY one bucket
    )
    docs = spark.createDataFrame(
        [(1, "good unseen unseen unseen")], "doc_id long, text string"
    )
    out = hashed_linear_scores(docs, weights, n_buckets=B).collect()[0]
    assert out["n_tokens"] == 4  # unseen tokens still counted
    assert out["logit"] == 0.1  # 400 / (4 * 1000)


def test_hashed_linear_scores_bias(spark):
    B = 16
    weights = spark.createDataFrame(
        [(b, 0) for b in range(B)], "bucket long, wt_m long"
    )
    docs = spark.createDataFrame([(1, "x y z"), (2, "")], "doc_id long, text string")
    out = {
        r["doc_id"]: r["logit"]
        for r in hashed_linear_scores(
            docs, weights, bias=0.7, n_buckets=B
        ).collect()
    }
    assert out[1] == 0.7 and out[2] == 0.7


def test_dsir_weights_rank_target_like_docs_higher(spark):
    """A doc built from the target corpus's vocabulary must out-weigh
    a doc from the disjoint off-target vocabulary, and the ratio
    table covers every bucket (smoothing mass for unseen grams)."""
    B = 256
    target = spark.createDataFrame(
        [(100 + i, "alpha beta gamma delta") for i in range(5)],
        "doc_id long, text string",
    )
    off = spark.createDataFrame(
        [(200 + i, "omega sigma tau upsilon") for i in range(20)],
        "doc_id long, text string",
    )
    corpus = target.unionByName(off)
    ratios = dsir_bucket_log_ratios(corpus, target, n_buckets=B)
    assert ratios.count() == B
    probe = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "omega sigma tau"), (3, "")],
        "doc_id long, text string",
    )
    w = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(probe, ratios, n_buckets=B).collect()
    }
    assert w[1] > w[2]  # target-like beats off-target
    assert w[3] == 0.0  # token-less doc carries no evidence
