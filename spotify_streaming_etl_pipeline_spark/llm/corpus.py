"""The whole web first mile as ONE call: archive bytes to a
training-ready, split corpus.  Every stage is an already-certified
operator from this package — this module only sequences them, the
``pipeline.py`` discipline applied to the LLM-data side:

  WARC bytes
    -> record table + 200/text-html filter + canonical URL + text +
       lang  (``warc.crawl_corpus`` — one narrow Arrow-batched plan)
    -> URL-level dedup    (min page id per canonical URL — the crawl
       dedup every pipeline runs first: mirrors/params collapse)
    -> exact dedup        (content-hash groupBy keepers)
    -> near dedup         (banded n-gram Jaccard pairs -> connected
       components -> min-id keepers)
    -> quality filter     (composite score quantile cutoff)
    -> leakage-safe split (near-dup clusters follow their group's
       hash bucket, so survivors' near-misses can never straddle
       train/test)

Scale shape: narrow until the dedup shuffles, each of which is banded
or hash-keyed (never corpus-pairwise); the quality pass is pure
codegen; the split is one shuffle_hash join + a narrow projection.
Page ids are ``doc_id * 4 + rec`` (a WARC blob carries at most 3
response records here) — deterministic, collision-free, and stable
across runs, so reruns produce byte-identical corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .curation import cluster_aware_split, quality_filter
from .dedup import dup_clusters, exact_dedup_groups, ngram_jaccard_pairs
from .text import quality_metrics
from .warc import crawl_corpus

#: Max response records per archive blob assumed by the page-id fold
#: (synth archives carry 1 + doc_id % 3 <= 3; real callers with larger
#: archives pass a bigger stride).
PAGE_ID_STRIDE = 4


def build_training_corpus(
    blobs: DataFrame,
    jaccard_threshold: float = 0.8,
    quality_quantile: float = 0.25,
    page_id_stride: int = PAGE_ID_STRIDE,
) -> DataFrame:
    """(doc_id, url, text, lang, quality_score, split): the training
    corpus a (doc_id, blob) archive frame yields after the full
    first-mile chain.  ``doc_id`` is the folded page id; one row per
    surviving page."""
    pages = crawl_corpus(blobs).select(
        (F.col("doc_id") * page_id_stride + F.col("rec")).alias("doc_id"),
        "url",
        "text",
        "lang",
    )
    # URL-level dedup: the same canonical URL crawled twice is one
    # page; keep the smallest page id (deterministic).
    url_keep = pages.groupBy("url").agg(F.min("doc_id").alias("doc_id"))
    pages = pages.join(
        url_keep.hint("shuffle_hash"), ["url", "doc_id"], "left_semi"
    )
    # Exact dedup: one keeper per distinct content.
    exact_keep = exact_dedup_groups(pages).select(
        F.col("keeper_doc_id").alias("doc_id")
    )
    pages = pages.join(exact_keep.hint("shuffle_hash"), "doc_id", "left_semi")
    # Near dedup: banded Jaccard pairs -> components -> min-id keeper.
    pairs = ngram_jaccard_pairs(pages, threshold=jaccard_threshold)
    clusters = dup_clusters(pairs)
    non_keepers = clusters.filter(
        F.col("doc_id") != F.col("cluster_id")
    ).select("doc_id")
    pages = pages.join(non_keepers.hint("shuffle_hash"), "doc_id", "left_anti")
    # Quality filter on the composite score.
    scored = pages.withColumn(
        "quality_score", quality_metrics(F.col("text"))["quality_score"]
    )
    kept = quality_filter(scored, quantile=quality_quantile)
    # Leakage-safe split: survivors follow their near-dup GROUP's
    # bucket, so a kept page and a filtered-out near-miss of a test
    # page can never recross the fence in a later rebuild.
    return cluster_aware_split(kept, clusters).select(
        "doc_id", "url", "text", "lang", "quality_score", "split"
    )
