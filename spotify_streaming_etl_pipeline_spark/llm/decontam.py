"""Benchmark decontamination and repetition quality signals.

Two more curation stages a training-data pipeline runs at scale:

- ``contamination_check``: flag corpus documents sharing >= ``min_hits``
  word n-grams with ANY document of a benchmark/eval set. Same
  inverted-index shape as the dedup family: both sides explode to
  48-bit shingle postings, equi-join on the shingle hash, count hits
  per (corpus doc, benchmark doc). The benchmark side is tiny, so its
  posting list broadcasts — the corpus is never shuffled.
- ``repetition_stats``: Gopher-style intra-document repetition — the
  fraction of duplicated n-grams within each document
  (1 - distinct/total). High values indicate boilerplate/spam; the
  computation is one pass of window n-gram assembly + one groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import portable_hash48


def _all_gram_hashes(df: DataFrame, text_col: str, n: int) -> DataFrame:
    """(doc_id, h) for EVERY n-gram occurrence (not distinct) —
    repetition needs multiplicity; see dedup._posting for the distinct
    variant and the plan rationale (window + codegen md5)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    words = df.select("doc_id", F.posexplode(toks).alias("pos", "word"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.col("word")] + [F.lead("word", j).over(w) for j in range(1, n)]
    return words.select(
        "doc_id",
        F.when(
            leads[-1].isNotNull(), portable_hash48(F.concat_ws("|", *leads))
        ).alias("h"),
    ).filter(F.col("h").isNotNull())


def repetition_stats(
    df: DataFrame, text_col: str = "text", n: int = 2
) -> DataFrame:
    """Per-doc (n_grams, n_distinct, dup_ratio rounded to 4): the
    duplicated-n-gram fraction quality signal."""
    grams = _all_gram_hashes(df, text_col, n)
    return grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.countDistinct("h").alias("n_distinct"),
        F.round(1 - F.countDistinct("h") / F.count(F.lit(1)), 4).alias("dup_ratio"),
    )


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 3,
    min_hits: int = 10,
) -> DataFrame:
    """Corpus docs overlapping a benchmark set: (doc_id, bench_id,
    n_hits) for pairs sharing >= min_hits distinct n-grams."""
    c = (
        _all_gram_hashes(corpus, text_col, n)
        .dropDuplicates(["doc_id", "h"])
    )
    b = (
        _all_gram_hashes(benchmark, text_col, n)
        .dropDuplicates(["doc_id", "h"])
        .select(F.col("doc_id").alias("bench_id"), "h")
    )
    return (
        c.join(F.broadcast(b), "h")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
    )
