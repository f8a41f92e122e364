"""Streaming near-dup admission: batch/stream parity and the
rejection semantics (corpus dups, intra-batch dups, novel docs)."""

from __future__ import annotations

from spotify_streaming_etl_pipeline_spark.streaming.admission import (
    admit_batch,
    dedup_admission_sink,
)
from spotify_streaming_etl_pipeline_spark.streaming.aggregates import read_state

# Long texts: a one-word edit keeps Jaccard ~0.78, which the 4x4
# MinHash band config deterministically catches (short docs can land
# a high-Jaccard pair in disjoint bands — that recall gap is the
# sketch trade-off the recall evals measure, not an admission bug).
_BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen sleepy"
    " cats watch quietly from the old wooden fence near the river bank"
    " at dusk"
)
_OTHER = (
    "completely different words appear in this sentence because the"
    " narrator switched topics to submarine maintenance schedules and"
    " galley inventory rotations for the long voyage south"
)
B1 = [
    (1, _BASE),
    (2, _OTHER),
    # intra-batch near-dup of 1 -> only min id admitted
    (3, _BASE.replace("dusk", "dawn")),
]
B2 = [
    # near-dup of admitted doc 1 -> rejected at the corpus check
    (10, _BASE.replace("seventeen", "eighteen")),
    # novel -> admitted
    (11, "an entirely novel document about streaming state machine"
         " admission checks and versioned snapshot publication order"),
    # exact text of doc 2 under a new id -> rejected
    (12, _OTHER),
]
SCHEMA = "doc_id long, text string"


def test_admit_batch_semantics(spark):
    b1 = spark.createDataFrame(B1, SCHEMA)
    a1 = admit_batch(b1, None, threshold=0.5)
    assert sorted(r.doc_id for r in a1.collect()) == [1, 2]
    b2 = spark.createDataFrame(B2, SCHEMA)
    a2 = admit_batch(b2, a1, threshold=0.5)
    assert sorted(r.doc_id for r in a2.collect()) == [11]


def test_stream_matches_sequential_batches(spark, tmp_path):
    import os

    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame(B1, SCHEMA).coalesce(1).write.parquet(src + "/b1")
    spark.createDataFrame(B2, SCHEMA).coalesce(1).write.parquet(src + "/b2")
    # file-source streams list files in one directory; re-write flat
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, b in enumerate((B1, B2)):
        spark.createDataFrame(b, SCHEMA).coalesce(1).write.parquet(
            f"{flat}/batch={i}"
        )

    state_dir = str(tmp_path / "state")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(flat)
    )
    q = (
        stream.writeStream.foreachBatch(
            dedup_admission_sink(state_dir, threshold=0.5)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    streamed = sorted(
        r.doc_id for r in read_state(spark, state_dir).collect()
    )
    # sequential reference: same admission function, batch at a time
    ref = admit_batch(spark.createDataFrame(B1, SCHEMA), None, threshold=0.5)
    ref = ref.unionByName(
        admit_batch(spark.createDataFrame(B2, SCHEMA), ref, threshold=0.5)
    )
    assert streamed == sorted(r.doc_id for r in ref.collect())
    assert streamed == [1, 2, 11]


def test_replayed_batch_is_idempotent(spark, tmp_path):
    state_dir = str(tmp_path / "state")
    sink = dedup_admission_sink(state_dir, threshold=0.5)
    b1 = spark.createDataFrame(B1, SCHEMA)
    b2 = spark.createDataFrame(B2, SCHEMA)
    sink(b1, 0)
    sink(b2, 1)
    once = sorted(r.doc_id for r in read_state(spark, state_dir).collect())
    sink(b2, 1)  # crash-replay of batch 1
    again = sorted(r.doc_id for r in read_state(spark, state_dir).collect())
    assert once == again == [1, 2, 11]


def test_redelivered_doc_id_not_duplicated_in_corpus(spark, tmp_path):
    """Review finding r6: at-least-once sources can redeliver a doc in
    a LATER batch (different batch_id, so version idempotence does not
    apply); its identity pair is excluded from the near-dup check, so
    without the corpus-id anti-join a unique doc would duplicate its
    own corpus row on every redelivery."""
    state_dir = str(tmp_path / "state")
    sink = dedup_admission_sink(state_dir, threshold=0.5)
    sink(spark.createDataFrame(B1, SCHEMA), 0)
    # batch 1 redelivers doc 2 verbatim alongside a novel doc
    redelivery = [B1[1], (20, "a brand new document about nothing seen before now")]
    sink(spark.createDataFrame(redelivery, SCHEMA), 1)
    rows = read_state(spark, state_dir).collect()
    ids = sorted(r.doc_id for r in rows)
    assert ids == [1, 2, 20]  # doc 2 present exactly ONCE


def _canon_posting(df):
    return sorted((r.doc_id, r.h1, r.h2) for r in df.collect())


def test_sink_maintains_posting_index(spark, tmp_path):
    """The maintained posting index must equal _posting(corpus) row
    for row after every batch (the incremental-union invariant), and
    a crash-replayed batch must republish the identical index
    version."""
    import os

    from spotify_streaming_etl_pipeline_spark.llm import dedup
    from spotify_streaming_etl_pipeline_spark.streaming.admission import (
        POSTING_SUBDIR,
    )

    state_dir = str(tmp_path / "state")
    posting_dir = os.path.join(state_dir, POSTING_SUBDIR)
    sink = dedup_admission_sink(state_dir, threshold=0.5)
    sink(spark.createDataFrame(B1, SCHEMA), 0)
    sink(spark.createDataFrame(B2, SCHEMA), 1)
    corpus = read_state(spark, state_dir)
    idx = read_state(spark, posting_dir)
    assert _canon_posting(idx) == _canon_posting(
        dedup._posting(corpus, "text")
    )
    once = _canon_posting(idx)
    sink(spark.createDataFrame(B2, SCHEMA), 1)  # crash-replay
    assert _canon_posting(read_state(spark, posting_dir)) == once
    # the corpus read must not see the nested index dir as a version
    assert sorted(r.doc_id for r in read_state(spark, state_dir).collect()) \
        == [1, 2, 11]


def test_sink_bootstraps_missing_posting_index(spark, tmp_path):
    """Corpus state written by an older sink (no index): the next
    batch degrades to derive-from-snapshot and publishes the full
    index for the new corpus."""
    import os
    import shutil

    from spotify_streaming_etl_pipeline_spark.llm import dedup
    from spotify_streaming_etl_pipeline_spark.streaming.admission import (
        POSTING_SUBDIR,
    )

    state_dir = str(tmp_path / "state")
    posting_dir = os.path.join(state_dir, POSTING_SUBDIR)
    sink = dedup_admission_sink(state_dir, threshold=0.5)
    sink(spark.createDataFrame(B1, SCHEMA), 0)
    shutil.rmtree(posting_dir)  # simulate pre-index state
    sink(spark.createDataFrame(B2, SCHEMA), 1)
    corpus = read_state(spark, state_dir)
    assert _canon_posting(read_state(spark, posting_dir)) == _canon_posting(
        dedup._posting(corpus, "text")
    )


def test_admit_batch_with_supplied_posting_matches_derived(spark):
    """admit_batch(corpus_posting=...) — the sink's index path — must
    be decision-identical to the derive-from-corpus path."""
    from spotify_streaming_etl_pipeline_spark.llm import dedup

    b1 = spark.createDataFrame(B1, SCHEMA)
    corpus = admit_batch(b1, None, threshold=0.5)
    b2 = spark.createDataFrame(B2, SCHEMA)
    derived = admit_batch(b2, corpus, threshold=0.5)
    supplied = admit_batch(
        b2, corpus, threshold=0.5,
        corpus_posting=dedup._posting(corpus, "text"),
    )
    assert sorted(r.doc_id for r in supplied.collect()) == sorted(
        r.doc_id for r in derived.collect()
    )
