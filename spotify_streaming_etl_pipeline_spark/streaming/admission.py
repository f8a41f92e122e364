"""Streaming near-dup ADMISSION: gate a document stream against the
growing corpus, per microbatch — the ingest-time form of the batch
``llm/dedup.py:minhash_incremental`` check (which documents may join a
training set), wired as a ``foreachBatch`` sink over the same
versioned-snapshot state machinery as the continuous aggregates.

Semantics per microbatch (deterministic, replay-safe):

1. in-batch id dedup (``dropDuplicates`` on doc_id);
2. corpus check: any batch doc whose MinHash-verified Jaccard against
   a CURRENT corpus doc clears the threshold is rejected — the band
   join touches corpus index buckets, never the corpus pairwise;
3. intra-batch near-dup: survivors cluster among themselves
   (``minhash_near_dup`` + ``dup_clusters``) and only each cluster's
   min-id keeper is admitted;
4. the new corpus snapshot (previous ∪ admitted) publishes as
   ``v={batch_id}`` with the same tmp-then-rename + _SUCCESS +
   committed-only-prune discipline as ``streaming/aggregates.py`` —
   a replayed batch re-reads the same predecessor and republishes the
   same version, so admission is exactly-once.

Scale: per batch the cost is batch-size × bucket-collision-rate band
probes plus a batch-sized clustering; the corpus is touched through
its (materialized) band index only.  In production the posting/band
tables persist as tables beside the corpus instead of being derived
from the snapshot per batch — same plan, one less recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..llm import dedup
from .aggregates import publish_snapshot, read_state


def admit_batch(
    batch: DataFrame,
    corpus: DataFrame | None,
    threshold: float = 0.8,
    text_col: str = "text",
) -> DataFrame:
    """The pure admission function (one microbatch against one corpus
    state) — shared by the streaming sink and the batch/stream parity
    test.  Returns the admitted rows of ``batch``.

    Cache hygiene: the posting tables are built HERE (once per side),
    threaded through both detectors, and unpersisted before returning
    — a long-running stream must not accumulate per-batch postings in
    executor storage (the r5 ADVICE leak class).  The admitted result
    is localCheckpoint-ed first so unpersisting cannot force a
    recompute-without-cache of the whole pipeline."""
    batch = batch.dropDuplicates(["doc_id"])
    if corpus is not None:
        # At-least-once redelivery across DIFFERENT batch ids: a doc
        # whose id is already in the corpus must not be re-admitted
        # (its own identity pair is excluded from the near-dup check
        # by design, so without this anti-join a redelivered unique
        # doc would duplicate its corpus row on every redelivery).
        batch = batch.join(corpus.select("doc_id"), "doc_id", "left_anti")
    batch_posting = dedup._posting(batch, text_col).persist()
    cleanup = [batch_posting]
    if corpus is not None:
        corpus_posting = dedup._posting(corpus, text_col).persist()
        cleanup.append(corpus_posting)
        rejected = (
            dedup.minhash_incremental(
                batch,
                corpus,
                threshold=threshold,
                text_col=text_col,
                # Ingest-time data is unaudited — exactly where a
                # boilerplate mega-bucket appears. Star-guard it.
                max_bucket_size=dedup.LSH_MAX_BUCKET,
                _corpus_posting_df=corpus_posting,
                _new_posting_df=batch_posting,
            )
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
        )
        batch = batch.join(rejected, "doc_id", "left_anti")
    # survivors-only posting: a superset posting would cluster rejected
    # docs too and could steal keeper slots from admitted ones.
    surv_posting = batch_posting.join(
        batch.select("doc_id"), "doc_id", "left_semi"
    )
    pairs = dedup.minhash_near_dup(
        batch,
        threshold=threshold,
        text_col=text_col,
        max_bucket_size=dedup.LSH_MAX_BUCKET,
        _posting_df=surv_posting,
    )
    clusters = dedup.dup_clusters(pairs)
    non_keepers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    admitted = batch.join(non_keepers, "doc_id", "left_anti").localCheckpoint(
        eager=True
    )
    for df in cleanup:
        df.unpersist()
    return admitted


def dedup_admission_sink(
    state_dir: str,
    threshold: float = 0.8,
    text_col: str = "text",
):
    """foreachBatch sink maintaining the admitted-corpus snapshot; use
    with ``stream.writeStream.foreachBatch(dedup_admission_sink(...))``
    and read the admitted corpus with ``aggregates.read_state``."""

    def sink(bdf: DataFrame, batch_id: int) -> None:
        spark = bdf.sparkSession
        corpus = read_state(spark, state_dir, below=batch_id)
        admitted = admit_batch(
            bdf.select("doc_id", text_col),
            corpus,
            threshold=threshold,
            text_col=text_col,
        )
        new_corpus = (
            corpus.unionByName(admitted) if corpus is not None else admitted
        )
        # Materialize THROUGH the write: new_corpus references the
        # previous snapshot's files, which prune may delete later —
        # the parquet write is the materialization barrier.
        publish_snapshot(new_corpus, state_dir, batch_id)

    return sink
