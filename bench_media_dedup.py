"""Scale legs for the curation families: line dedup, bloom
decontamination, and the image/audio/video near-dups at n, 10n, and
(opt-in) 100n documents — the 100 TB design check (does wall-clock
grow ~linearly when the problem grows 10x/100x AT CONSTANT DUP-GROUP
SIZE?).

Group sizes are held constant by scaling the pattern count with n
(n_patterns = n // 16) — the make_sf1.py discipline: 10 verbatim
pattern copies would turn every dup group into a 10x clique and the
pair count quadratic, benchmarking a different problem.  Text legs
replicate the sf0.1 substrate with replica-salted tokens (same rule
make_sf1.py uses); media legs need only doc ids (the synth corpora
are arithmetic functions of doc_id), so they scale by widening the
id range.

Usage: python bench_media_dedup.py
  env: SPARK_GRAFT_SF_DIR       (default /root/testdata/sf0.1)
       SPARK_GRAFT_MEDIA_SCALES (default "1,10"; set "1,10,100" for
                                 the full 100x leg)
Prints one JSON line {family: {sec per scale, ratios}}.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from spotify_streaming_etl_pipeline_spark.llm import lines, multimodal, overlap
from spotify_streaming_etl_pipeline_spark.llm.bpe import bpe_train
from spotify_streaming_etl_pipeline_spark.llm.decontam import bloom_decontam
from spotify_streaming_etl_pipeline_spark.llm.unigram import unigram_train
from spotify_streaming_etl_pipeline_spark.session import get_spark
from spotify_streaming_etl_pipeline_spark.sources.catalog import load_table


def _noop(build_fn) -> float:
    """Time construction AND execution: some operators materialize
    eagerly during construction (geometry probes, checkpoints), so
    timing only the final action would under-count them."""
    t0 = time.time()
    build_fn().write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def _replicate_text(spark, docs, n: int, k: int):
    """k-fold text replica: keys strided, tokens replica-salted
    (cross-replica line/gram similarity collapses; within-replica
    structure intact — near-dup work scales linearly, not
    quadratically)."""
    if k == 1:
        return docs
    replicas = spark.range(k).select(F.col("id").alias("r"))
    return (
        docs.crossJoin(replicas)
        .select(
            (F.col("doc_id") + F.col("r") * (n + 1)).alias("doc_id"),
            F.when(F.col("r") == 0, F.col("text"))
            .otherwise(
                F.array_join(
                    F.transform(
                        F.split("text", " "),
                        lambda t: F.concat(
                            t, F.lit("_"), F.col("r").cast("string")
                        ),
                    ),
                    " ",
                )
            )
            .alias("text"),
        )
        .localCheckpoint(eager=True)
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scales = [
        int(s)
        for s in os.environ.get("SPARK_GRAFT_MEDIA_SCALES", "1,10").split(",")
    ]
    spark = get_spark("bench-media-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()
    text_ds = {k: _replicate_text(spark, docs, n, k) for k in scales}
    out: dict[str, dict] = {}

    only = {
        s for s in os.environ.get("SPARK_GRAFT_MEDIA_LEGS", "").split(",") if s
    }

    def leg(name, build, datasets, max_scale=None):
        if only and name not in only:
            return
        row: dict[str, float] = {}
        prev_key = None
        for k in scales:
            if max_scale is not None and k > max_scale:
                break
            t = _noop(lambda: build(datasets[k], k * n))
            row[f"x{k}_sec"] = t
            if prev_key is not None:
                row[f"ratio_{prev_key}_to_x{k}"] = round(
                    t / max(row[f"x{prev_key}_sec"], 1e-9), 2
                )
            prev_key = k
        out[name] = row
        print(f"  {name}: {row}", flush=True)

    leg(
        "line_dedup_decisions",
        lambda d, _n: lines.line_dedup_decisions(lines.reflow_lines(d, 3)),
        text_ds,
    )
    leg(
        "bloom_decontam",
        lambda d, _n: bloom_decontam(
            d, d.filter(F.col("doc_id") % 10 == 0), m_bits=1 << 20, k=3
        ),
        text_ds,
    )

    # tokenizer trainers: round count is a fixed parameter (driver
    # loop), so the leg checks the PER-ROUND wall grows sub-linearly —
    # after the initial corpus-sized word_freq fold, every round is
    # vocabulary-sized.
    leg("unigram_train_r2", lambda d, _n: unigram_train(d, rounds=2), text_ds)
    leg("bpe_train_8_merges", lambda d, _n: bpe_train(d, n_merges=8), text_ds)

    # verbatim family with a PLANTED corpus-hot boilerplate window:
    # every doc carries the same 64-char license tail, so its window
    # hashes post n times (n >> max_postings=1000 at every scale) and
    # the pre-fold count guard must DROP them before any posting
    # materializes — pre-r11 the pairwise form built an n-length
    # posting array per boilerplate hash (the executor-OOM shape at
    # 100 TB); the legs prove the guard, not just the speed.
    #
    # The PAIRWISE form (duplicate_spans) inherently emits sum(group
    # size SQUARED) matched-position rows — with the r11 default cap
    # of 1000 the mid-frequency windows (100 < n <= 1000) alone
    # measured 2.4e9 pairs from 2.2e7 postings at 10x on this corpus
    # (docs genuinely share phrases across hundreds of pages), an
    # 8 GB-heap OOM.  r12 drops the DEFAULT max_postings to 100,
    # bounding pairs at 100 x postings (linear in corpus), so the
    # bare-default leg now runs the 10x step too — proving the
    # default call survives the scale that OOM'd it;
    # occurrence_removal_intervals is the LINEAR 100 TB removal path
    # and runs the full sweep.
    boiler = (
        " COPYRIGHT LICENSE BOILERPLATE BLOCK IDENTICAL IN EVERY SINGLE DOC."
    )

    def _boilered(d):
        return d.withColumn(
            "text", F.concat(F.col("text"), F.lit(boiler))
        )

    leg(
        "verbatim_spans_hot_boilerplate",
        lambda d, _n: overlap.duplicate_spans(_boilered(d), min_len=24),
        text_ds,
        max_scale=10,
    )
    leg(
        "verbatim_occurrence_removal_hot",
        lambda d, _n: overlap.occurrence_removal_intervals(
            _boilered(d), min_len=24
        ),
        text_ds,
    )

    # media legs: the synth corpora are pure functions of doc_id, so
    # scaling = widening the id range (no text replication needed)
    id_ds = {k: spark.range(k * n).select(F.col("id").alias("doc_id"))
             for k in scales}

    def fp_leg(name, synth, fingerprint, max_h):
        def build(d, n_docs):
            media = synth(d, n_patterns=max(13, n_docs // 16))
            return multimodal.fingerprint_near_dup(
                fingerprint(media), max_hamming=max_h
            )

        leg(name, build, id_ds)

    fp_leg(
        "image_ahash_pairs",
        multimodal.synth_pattern_png_corpus,
        multimodal.image_ahash,
        4,
    )
    # the image SCALE form: 128-bit aHash (hash_h=16) widens the t=4
    # band keys from ~12 to ~25 bits — with the r12 substrate spread
    # the distinct-fingerprint count finally grows with the corpus
    # (~56k at 100x), which saturates the 64-bit form's 4-8k-key
    # bands exactly as the docstring predicts
    fp_leg(
        "image_ahash16_pairs",
        multimodal.synth_pattern_png_corpus,
        lambda media: multimodal.image_ahash(media, hash_h=16),
        4,
    )
    fp_leg(
        "audio_fingerprint_pairs",
        multimodal.synth_tone_wav_corpus,
        multimodal.audio_fingerprint,
        6,
    )

    # the audio SCALE form: 128-bit fingerprints (n_frames=128) widen
    # the t=6 band keys from ~9 to ~18 bits — the 64-bit form's
    # 512-key space saturates at large distinct-fingerprint counts
    # (measured 47x wall at the 10->100x step before this path)
    fp_leg(
        "audio_fp128_pairs",
        multimodal.synth_tone_wav_corpus,
        lambda media: multimodal.audio_fingerprint(media, n_frames=128),
        6,
    )

    def video_build(d, n_docs):
        media = multimodal.synth_video_corpus(
            d, shared_patterns=max(13, n_docs // 16)
        )
        return multimodal.video_near_dup(media, threshold=0.5)

    leg("video_near_dup", video_build, id_ds)
    print(
        json.dumps(
            {
                "metric": "media_dedup_scaling",
                "n_docs": n,
                "scales": scales,
                "legs": out,
            }
        )
    )


if __name__ == "__main__":
    main()
