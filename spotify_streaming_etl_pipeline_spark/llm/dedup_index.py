"""Materialized MinHash dedup-index lifecycle: write once, append per
batch, check batches without ever re-shingling the corpus.

At 100 TB nobody recomputes the corpus posting/band tables per
admission batch — ``minhash_band_table``'s docstring says "persist or
write it once"; this module IS that production flow, as two parquet
tables under one index root:

- ``<path>/posting``: (doc_id, h1, h2, batch_id) — the shingle
  inverted index that exact-Jaccard verification joins against.
- ``<path>/bands``:   (doc_id, band, key, batch_id) — the LSH band
  index that batch candidates equi-join against.

Both are partitioned by ``batch_id`` and written with DYNAMIC
partition overwrite, so a retried append of the same batch REPLACES
its own partition instead of duplicating rows — exactly-once per
(path, batch_id) under at-least-once drivers, the same idempotence
contract as ``operators/writer.py`` but achieved with partition
atomicity instead of an anti-join (the index is append-mostly and
batch-addressed; a read-side anti-join would rescan the corpus).

Checking a batch loads the two tables and reuses the exact join
stages of the in-flight path (``dedup.incremental_band_candidates`` +
``dedup.pair_jaccard``), so the stored-index answer is definitionally
the same computation — the oracle gate pins it to the same SQL as
``incremental_near_dup``.

Reference parity note: the reference has no dedup index (its only
dedup is exact-key set difference, scripts/etl/extractor.py:227-252);
this is part of the additive LLM-curation family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import dedup

__all__ = [
    "write_dedup_index",
    "load_dedup_index",
    "check_batch_against_index",
]


def _write(df: DataFrame, path: str) -> None:
    # REBALANCE by the partition column before the partitioned write
    # (guide §6): without it every upstream task writes its own sliver
    # into every batch_id dir (measured: 64 files / 3.6s for a 2-batch
    # toy vs 2 files / 1.2s rebalanced).  AQE sizes the post-shuffle
    # partitions, so a big batch still fans out to many
    # advisory-sized files — scale-adaptive, not a coalesce(1).
    (
        df.hint("rebalance", "batch_id")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
    )


def write_dedup_index(
    docs: DataFrame,
    path: str,
    batch_id: int = 0,
    text_col: str = "text",
) -> None:
    """Write (or idempotently re-write) one batch's slice of the
    index: the posting and band tables for ``docs``, under partition
    ``batch_id``. First call creates the index; subsequent calls with
    new batch_ids append; a RETRY of a batch_id replaces only its own
    partition (dynamic overwrite), never duplicating rows. The heavy
    tokenize/shingle work happens exactly once per batch, here."""
    posting = dedup._posting(docs, text_col).persist()
    bands = dedup.minhash_band_table(docs, text_col=text_col, _posting_df=posting)
    # Sequential commits (an r12 A/B measured the concurrent
    # fill-then-two-threaded-writes form 0.45s SLOWER at sf0.1: the
    # explicit cache-fill job costs more than the write overlap buys
    # at these table sizes; the posting write below IS the fill).
    _write(posting.withColumn("batch_id", F.lit(batch_id)), f"{path}/posting")
    _write(bands.withColumn("batch_id", F.lit(batch_id)), f"{path}/bands")
    posting.unpersist()


def load_dedup_index(spark: SparkSession, path: str) -> dict:
    """{"posting": DataFrame, "bands": DataFrame} — the materialized
    index, batch_id column dropped (membership is the union of every
    batch partition; partition pruning still applies upstream if a
    caller filters on batch_id before dropping it)."""
    return {
        "posting": spark.read.parquet(f"{path}/posting").drop("batch_id"),
        "bands": spark.read.parquet(f"{path}/bands").drop("batch_id"),
    }


def check_batch_against_index(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    threshold: float = 0.8,
    text_col: str = "text",
    max_bucket_size: int | None = dedup.LSH_MAX_BUCKET,
) -> DataFrame:
    """(doc_a = corpus id, doc_b = batch id, jaccard): which batch
    docs near-duplicate the INDEXED corpus — ``minhash_incremental``
    semantics with the corpus side read from the materialized index
    instead of recomputed, so per-batch cost is batch tokenization +
    the band join; the corpus text is never touched. Guarded at
    ``LSH_MAX_BUCKET`` by default: an index accumulates unaudited
    batches, which is exactly where the boilerplate mega-bucket
    appears (same default as streaming/admission.py)."""
    idx = load_dedup_index(spark, path)
    batch_posting = dedup._posting(batch, text_col).persist()
    batch_bands = dedup.minhash_band_table(
        batch, text_col=text_col, _posting_df=batch_posting
    )
    cands = dedup.incremental_band_candidates(
        idx["bands"], batch_bands, max_bucket_size=max_bucket_size
    )
    return dedup.pair_jaccard(
        idx["posting"], cands, posting_b=batch_posting
    ).filter(F.col("jaccard") >= threshold)
