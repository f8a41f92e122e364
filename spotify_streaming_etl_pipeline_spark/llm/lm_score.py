"""Bigram language-model scoring: per-document average log-probability
under an add-one-smoothed bigram model trained on the corpus itself —
the perplexity-proxy quality signal production pipelines (CCNet-style)
use to rank text before mixing (additive family, SURVEY §2.11).
Low-scoring documents read as "unnatural" relative to the corpus:
boilerplate, mangled encodings, word salad.

Plan shape: the bigram stream is a shuffle-free zip of shifted
token-array slices (the bigram_pmi substrate — never a corpus-wide
sort). Model tables are map-side-combined groupBys (bigram counts,
unigram counts, one scalar vocab size). Scoring joins the stream to
the model on the bigram key and aggregates per doc — shuffle volume is
the bigram stream + vocabulary, and the model tables are reusable
DataFrames (write them once, score any batch against them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def bigram_stream(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, w1, w2) adjacent pairs, in-document order irrelevant
    downstream (scores aggregate).  Built as a 2-way zip of shifted
    token-array slices exploded in place (the r12 ``dedup._posting``
    rewrite): both slices have exactly size-1 elements, so the zip
    never null-pads and the pair multiset is byte-identical to the
    earlier per-doc lead-window form — minus that form's word-level
    shuffle and per-partition sort."""
    length = F.greatest(F.lit(0), F.size("t") - 1)
    return (
        df.select("doc_id", tokens(F.col(text_col)).alias("t"))
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("t"), 1, length),
                    F.slice(F.col("t"), 2, length),
                )
            ).alias("g"),
        )
        .select(
            "doc_id",
            F.col("g")["0"].alias("w1"),
            F.col("g")["1"].alias("w2"),
        )
    )


def bigram_lm_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_bigrams, avg_logprob): mean ln P(w2|w1) per document
    under add-one smoothing, P = (c(w1,w2)+1) / (c(w1)+V).

    Higher is more corpus-typical; filter the low tail. Documents with
    fewer than two tokens produce no bigrams and are absent (score
    them by other signals — llm/text.quality_metrics)."""
    bg = bigram_stream(df, text_col)
    bc = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("double").alias("cb")
    )
    uc = (
        df.select("doc_id", F.explode(tokens(F.col(text_col))).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).cast("double").alias("cu"))
    )
    vsize = uc.agg(F.count(F.lit(1)).cast("double").alias("vsize"))
    return (
        bg.join(bc, ["w1", "w2"])
        .join(uc, "w1")
        .crossJoin(F.broadcast(vsize))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(
                F.avg(F.log((F.col("cb") + 1) / (F.col("cu") + F.col("vsize")))),
                4,
            ).alias("avg_logprob"),
        )
    )
