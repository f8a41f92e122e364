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
its (materialized) band index only.  The sink maintains the corpus
POSTING table as a versioned snapshot beside the corpus (same
tmp-then-rename discipline, directory ``{state_dir}/posting_index``):
each batch reads the previous posting version instead of re-shingling
the whole corpus, and appends only the admitted docs' postings —
posting is per-doc deterministic, so ``posting(corpus) ∪
posting(admitted) == posting(corpus ∪ admitted)`` exactly, and a
replayed batch republishes the identical version (exactly-once holds
for the index too).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..llm import dedup
from .aggregates import publish_snapshot, read_state

#: Subdirectory of the sink's state_dir holding the versioned corpus
#: posting index (doc_id, h1, h2) — ignored by the corpus read_state,
#: which only lists v= entries.
POSTING_SUBDIR = "posting_index"


def _decide(
    batch: DataFrame,
    corpus: DataFrame | None,
    threshold: float,
    text_col: str,
    corpus_posting: DataFrame | None = None,
) -> tuple[DataFrame, list[DataFrame]]:
    """The admission DECISION TABLE (doc_id, decision) for every
    distinct batch doc — the single code path behind both the
    streaming sink (``admit_batch``) and the oracle-gated batch form
    (``admission_decisions``).  Decisions:

    - ``rejected_known_id``   — the doc's id is already in the corpus
      (at-least-once redelivery across DIFFERENT batch ids; its own
      identity pair is excluded from the near-dup check by design, so
      without this a redelivered unique doc would duplicate its corpus
      row on every redelivery);
    - ``rejected_corpus_dup`` — MinHash-verified Jaccard against a
      current corpus doc clears the threshold (band join against the
      corpus index, never the corpus pairwise);
    - ``rejected_batch_dup``  — a non-keeper of an intra-batch
      near-dup cluster (keeper = cluster-min id);
    - ``admitted``            — everything else.

    ``corpus_posting`` supplies the maintained posting index (the
    sink's production path); when None it is derived from the corpus
    snapshot — same rows by construction, one extra corpus-wide
    shingle pass.

    Returns (decisions, cleanup): callers MUST materialize decisions
    (localCheckpoint) before unpersisting the cleanup postings."""
    batch = batch.dropDuplicates(["doc_id"])
    ids = batch.select("doc_id")
    if corpus is not None:
        fresh = batch.join(corpus.select("doc_id"), "doc_id", "left_anti")
    else:
        fresh = batch
    batch_posting = dedup._posting(fresh, text_col).persist()
    # The batch band table is per-doc deterministic, so it is computed
    # ONCE here and reused by both detectors: the corpus check joins
    # it whole, and the intra-batch check gets the survivor slice via
    # a semi-join — the signature aggregation (16 min-folds over the
    # posting) used to run a second time for the survivor side.
    batch_bands = dedup.minhash_band_table(
        fresh, text_col=text_col, _posting_df=batch_posting
    ).persist()
    # Per-doc gram counts, likewise per-doc deterministic: ONE
    # aggregation threaded into every verify that sizes a batch-side
    # doc (the corpus check's doc_b side and BOTH sides of the
    # intra-batch check — pair_jaccard's joins are inner on the pair
    # ids, so the whole-batch table serves the survivor slice
    # unchanged).  Without this each pair_jaccard call re-aggregated
    # the posting per side.
    batch_sizes = batch_posting.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams")
    ).persist()
    cleanup = [batch_posting, batch_bands, batch_sizes]
    if corpus is not None:
        if corpus_posting is None:
            corpus_posting = dedup._posting(corpus, text_col)
        corpus_posting = corpus_posting.persist()
        cleanup.append(corpus_posting)
        corpus_dup = (
            dedup.minhash_incremental(
                fresh,
                corpus,
                threshold=threshold,
                text_col=text_col,
                # Ingest-time data is unaudited — exactly where a
                # boilerplate mega-bucket appears. Star-guard it.
                max_bucket_size=dedup.LSH_MAX_BUCKET,
                _corpus_posting_df=corpus_posting,
                _new_posting_df=batch_posting,
                _new_bands_df=batch_bands,
                _new_sizes_df=batch_sizes,
            )
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
            # Referenced by three separate subtrees (survivor anti-join,
            # the is_corpus_dup mark, and again when dup_clusters runs
            # its edge-collect action) — Spark does not dedupe common
            # subtrees, so without this the band-join + exact-verify
            # pipeline above executes once per reference.
            .persist()
        )
        cleanup.append(corpus_dup)
        surv = fresh.join(corpus_dup, "doc_id", "left_anti")
    else:
        corpus_dup = None
        surv = fresh
    # survivors-only posting/bands: a superset posting would cluster
    # rejected docs too and could steal keeper slots from admitted
    # ones; the survivor band slice is row-identical to re-deriving
    # bands from the survivor posting (bands are per-doc).
    surv_posting = batch_posting.join(
        surv.select("doc_id"), "doc_id", "left_semi"
    )
    surv_bands = batch_bands.join(
        surv.select("doc_id"), "doc_id", "left_semi"
    )
    pairs = dedup.minhash_near_dup(
        surv,
        threshold=threshold,
        text_col=text_col,
        max_bucket_size=dedup.LSH_MAX_BUCKET,
        _posting_df=surv_posting,
        _bands_df=surv_bands,
        _sizes_df=batch_sizes,
    )
    clusters = dedup.dup_clusters(pairs)
    non_keepers = clusters.filter(
        F.col("doc_id") != F.col("cluster_id")
    ).select("doc_id")

    def _mark(base: DataFrame, flagged: DataFrame | None, col: str) -> DataFrame:
        if flagged is None:
            return base.withColumn(col, F.lit(False))
        return base.join(
            flagged.select("doc_id").withColumn(col, F.lit(True)),
            "doc_id",
            "left",
        ).withColumn(col, F.coalesce(F.col(col), F.lit(False)))

    marked = _mark(ids, fresh, "is_fresh") if corpus is not None else ids
    if corpus is None:
        marked = marked.withColumn("is_fresh", F.lit(True))
    marked = _mark(marked, corpus_dup, "is_corpus_dup")
    marked = _mark(marked, non_keepers, "is_batch_dup")
    decisions = marked.select(
        "doc_id",
        F.when(~F.col("is_fresh"), F.lit("rejected_known_id"))
        .when(F.col("is_corpus_dup"), F.lit("rejected_corpus_dup"))
        .when(F.col("is_batch_dup"), F.lit("rejected_batch_dup"))
        .otherwise(F.lit("admitted"))
        .alias("decision"),
    )
    return decisions, cleanup


def admission_decisions(
    batch: DataFrame,
    corpus: DataFrame | None = None,
    threshold: float = 0.8,
    text_col: str = "text",
) -> DataFrame:
    """Public decision-table form of the admission check — what a
    corpus-QA audit reads ("why was doc X rejected?").  One row per
    distinct batch doc: (doc_id, decision).  Oracle-gated
    (plans/llm_dedup_gates.py:admission_table) on the same code path
    the streaming sink executes."""
    decisions, cleanup = _decide(batch, corpus, threshold, text_col)
    out = decisions.localCheckpoint(eager=True)
    for df in cleanup:
        df.unpersist()
    return out


def admit_batch(
    batch: DataFrame,
    corpus: DataFrame | None,
    threshold: float = 0.8,
    text_col: str = "text",
    corpus_posting: DataFrame | None = None,
) -> DataFrame:
    """The pure admission function (one microbatch against one corpus
    state) — shared by the streaming sink and the batch/stream parity
    test.  Returns the admitted rows of ``batch`` (the
    decision == 'admitted' slice of ``_decide``).

    Cache hygiene: the posting tables are built once per side inside
    ``_decide``, threaded through both detectors, and unpersisted
    before returning — a long-running stream must not accumulate
    per-batch postings in executor storage (the r5 ADVICE leak class).
    The admitted result is localCheckpoint-ed first so unpersisting
    cannot force a recompute-without-cache of the whole pipeline."""
    decisions, cleanup = _decide(
        batch, corpus, threshold, text_col, corpus_posting=corpus_posting
    )
    admitted = (
        batch.dropDuplicates(["doc_id"])
        .join(
            decisions.filter(F.col("decision") == "admitted"),
            "doc_id",
            "left_semi",
        )
        .localCheckpoint(eager=True)
    )
    for df in cleanup:
        df.unpersist()
    return admitted


def dedup_admission_sink(
    state_dir: str,
    threshold: float = 0.8,
    text_col: str = "text",
):
    """foreachBatch sink maintaining the admitted-corpus snapshot AND
    its posting index; use with
    ``stream.writeStream.foreachBatch(dedup_admission_sink(...))`` and
    read the admitted corpus with ``aggregates.read_state``.

    The posting index (``{state_dir}/posting_index``, same versioned
    layout) is the module-documented production form: each batch reads
    the previous posting version instead of re-shingling the whole
    corpus — the corpus-size-proportional recompute this sink used to
    pay per batch — and appends only the admitted docs' postings.  A
    missing index (bootstrap, or state written by an older sink)
    degrades to the derive-from-snapshot path for that batch and the
    full index is published from the new corpus."""

    def sink(bdf: DataFrame, batch_id: int) -> None:
        spark = bdf.sparkSession
        posting_dir = os.path.join(state_dir, POSTING_SUBDIR)
        corpus = read_state(spark, state_dir, below=batch_id)
        posting = (
            read_state(spark, posting_dir, below=batch_id)
            if corpus is not None
            else None
        )
        admitted = admit_batch(
            bdf.select("doc_id", text_col),
            corpus,
            threshold=threshold,
            text_col=text_col,
            corpus_posting=posting,
        )
        new_corpus = (
            corpus.unionByName(admitted) if corpus is not None else admitted
        )
        # Materialize THROUGH the write: new_corpus references the
        # previous snapshot's files, which prune may delete later —
        # the parquet write is the materialization barrier.
        publish_snapshot(new_corpus, state_dir, batch_id)
        # Posting is per-doc deterministic, so prev ∪ posting(admitted)
        # equals posting(new_corpus) row for row; the parquet write is
        # again the barrier against pruned predecessor versions.  The
        # bootstrap path shingles the JUST-PUBLISHED snapshot files,
        # not the pre-write lineage (whose inputs the corpus prune may
        # have removed).
        if posting is not None:
            new_posting = posting.unionByName(
                dedup._posting(admitted, text_col)
            )
        else:
            new_posting = dedup._posting(
                read_state(spark, state_dir, below=batch_id + 1), text_col
            )
        publish_snapshot(new_posting, posting_dir, batch_id)

    return sink
