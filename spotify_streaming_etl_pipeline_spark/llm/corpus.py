"""The whole web first mile as ONE call: archive bytes to a
training-ready, split corpus.  Every stage is an already-certified
operator from this package — this module only sequences them, the
``pipeline.py`` discipline applied to the LLM-data side:

  WARC bytes
    -> record table + 200/text-html filter + canonical URL + text +
       lang  (``warc.crawl_corpus`` — one narrow Arrow-batched plan)
    -> PDF route          (optional: 200/application-pdf records
       re-parsed with raw bytes and text-extracted through the REAL
       PDF parser — ``warc.pdf_record_table`` +
       ``multimodal.pdf_text_features`` — then unioned in as pages)
    -> robots.txt gate    (optional: drop pages a polite crawler may
       not fetch — ``robots.robots_decisions`` against the supplied
       rules table)
    -> URL-level dedup    (min page id per canonical URL — the crawl
       dedup every pipeline runs first: mirrors/params collapse)
    -> exact dedup        (content-hash groupBy keepers)
    -> line-level dedup   (optional: C4/RefinedWeb boilerplate
       removal — rebuild every page from its corpus-wide
       first-occurrence lines; pages left empty drop)
    -> near dedup         (banded n-gram Jaccard pairs -> connected
       components -> min-id keepers)
    -> decontamination    (optional: drop pages whose n-gram bloom
       hit ratio against a benchmark suite crosses the flag
       threshold — ``decontam.bloom_decontam``)
    -> quality filter     (composite score quantile cutoff)
    -> leakage-safe split (near-dup clusters follow their group's
       hash bucket, so survivors' near-misses can never straddle
       train/test)

Scale shape: narrow until the dedup shuffles, each of which is banded
or hash-keyed (never corpus-pairwise); the robots rules and bloom
bits broadcast (host-bounded / m-bounded); the quality pass is pure
codegen; the split is one shuffle_hash join + a narrow projection.
Page ids are ``doc_id * 4 + rec`` (a WARC blob carries at most 3
response records here) — deterministic, collision-free, and stable
across runs, so reruns produce byte-identical corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .curation import cluster_aware_split, quality_filter
from .decontam import bloom_decontam
from .dedup import dup_clusters, exact_dedup_groups, ngram_jaccard_pairs
from .lines import line_dedup
from .robots import robots_decisions
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
    robots_rules: DataFrame | None = None,
    robots_agent: str = "*",
    include_pdfs: bool = False,
    line_dedup_boilerplate: bool = False,
    verbatim_min_len: int | None = None,
    verbatim_mode: str = "pairwise",
    benchmark: DataFrame | None = None,
    bloom_m_bits: int = 1 << 20,
    bloom_k: int = 3,
    bloom_flag_ratio: float = 0.5,
) -> DataFrame:
    """(doc_id, url, text, lang, quality_score, split): the training
    corpus a (doc_id, blob) archive frame yields after the full
    first-mile chain.  ``doc_id`` is the folded page id; one row per
    surviving page.

    Optional stages (each an already-certified operator, skipped when
    its input is absent): ``include_pdfs`` — route the archives'
    200/application-pdf records through the real PDF text extractor
    and union them in as pages (form-feeds/newlines folded to the
    single-space token contract; pages whose extraction dead-letters
    drop); ``robots_rules`` — a ``parse_robots`` table
    applied for ``robots_agent`` right after the crawl (audit-time
    politeness: pages a polite crawler may not fetch leave the
    corpus); ``line_dedup_boilerplate`` — corpus-wide
    first-occurrence line dedup with in-place text rebuild (C4
    §2.2 / RefinedWeb §3.4; pages reduced to nothing drop);
    ``verbatim_min_len`` — SURGICAL substring removal after near
    dedup (Lee et al. 2022 "Deduplicating Training Data Makes
    Language Models Better"): ``winnowed_overlap_pairs`` funnels the
    candidate pairs, ``duplicate_spans`` finds maximal shared
    substrings of at least that many chars, non-keeper pages are
    rebuilt with the spans cut out (``removal_intervals`` +
    ``apply_removal``), and pages emptied by the surgery drop;
    ``verbatim_mode="occurrence"`` swaps the pairwise span
    enumeration for ``occurrence_removal_intervals`` — linear in
    occurrences instead of group-size-squared in pairs, the form to
    use when passages are shared by MANY pages (boilerplate-heavy
    crawls at 100 TB);
    ``benchmark`` — bloom decontamination against the suite's
    n-grams at the given filter geometry."""
    pages = crawl_corpus(
        blobs, block_newlines=line_dedup_boilerplate
    ).select(
        (F.col("doc_id") * page_id_stride + F.col("rec")).alias("doc_id"),
        "url",
        "text",
        "lang",
    )
    if include_pdfs:
        from .multimodal import pdf_text_features
        from .text import canonical_url, lang_id
        from .warc import pdf_record_table

        pdf_recs = pdf_record_table(blobs).select(
            (F.col("doc_id") * page_id_stride + F.col("rec")).alias(
                "doc_id"
            ),
            canonical_url(F.col("url")).alias("url"),
            "blob",
        )
        pdf_text = F.translate("text", "\f\n", "  ")
        pdf_pages = (
            pdf_text_features(pdf_recs)
            .filter(F.col("text").isNotNull())
            .join(pdf_recs.select("doc_id", "url"), "doc_id")
            .select(
                "doc_id",
                "url",
                pdf_text.alias("text"),
                lang_id(pdf_text).alias("lang"),
            )
        )
        pages = pages.unionByName(pdf_pages)
    if robots_rules is not None:
        allowed = robots_decisions(
            pages.select("doc_id", "url"), robots_rules, agent=robots_agent
        ).filter("allowed")
        pages = pages.join(
            allowed.select("doc_id").hint("shuffle_hash"),
            "doc_id",
            "left_semi",
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
    if line_dedup_boilerplate:
        # dedup lines on the block structure, then fold the survivors
        # back to the single-space token contract every downstream
        # stage (shingles, quality, lang) speaks
        rebuilt = line_dedup(pages).filter(F.col("n_kept") > 0)
        pages = pages.drop("text").join(
            rebuilt.select(
                "doc_id",
                F.translate("clean_text", "\n", " ").alias("text"),
            ),
            "doc_id",
        )
    # Near dedup: banded Jaccard pairs -> components -> min-id keeper.
    pairs = ngram_jaccard_pairs(pages, threshold=jaccard_threshold)
    clusters = dup_clusters(pairs)
    non_keepers = clusters.filter(
        F.col("doc_id") != F.col("cluster_id")
    ).select("doc_id")
    pages = pages.join(non_keepers.hint("shuffle_hash"), "doc_id", "left_anti")
    if verbatim_min_len is not None:
        # Surgical verbatim-span removal (Lee et al. 2022): doc-level
        # near dedup above leaves pages that SHARE long passages
        # without being near-duplicates (a long page quoting another);
        # cut the shared substrings out of the non-keeper instead of
        # dropping either page.  The winnowed-fingerprint funnel keeps
        # the position-level posting corpus-sublinear at 100 TB.
        from .overlap import (
            apply_removal,
            duplicate_spans,
            occurrence_removal_intervals,
            removal_intervals,
            winnowed_overlap_pairs,
        )

        if verbatim_mode == "occurrence":
            iv = occurrence_removal_intervals(
                pages, min_len=verbatim_min_len
            )
        elif verbatim_mode == "pairwise":
            iv = removal_intervals(
                duplicate_spans(
                    pages,
                    min_len=verbatim_min_len,
                    candidates=winnowed_overlap_pairs(pages),
                )
            )
        else:
            raise ValueError(
                f"verbatim_mode must be 'pairwise' or 'occurrence', "
                f"got {verbatim_mode!r}"
            )
        cleaned = apply_removal(pages, iv)
        pages = pages.drop("text").join(
            cleaned.select(
                "doc_id", F.col("clean_text").alias("text")
            ),
            "doc_id",
        ).filter(F.length(F.trim("text")) > 0)
    if benchmark is not None:
        contaminated = bloom_decontam(
            pages,
            benchmark,
            m_bits=bloom_m_bits,
            k=bloom_k,
            flag_ratio=bloom_flag_ratio,
        ).filter("flagged")
        pages = pages.join(
            contaminated.select("doc_id").hint("shuffle_hash"),
            "doc_id",
            "left_anti",
        )
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
