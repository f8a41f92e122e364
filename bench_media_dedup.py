"""Scale legs for the round-9 curation families: line dedup, bloom
decontamination, and the image/audio fingerprint near-dups at n and
10n documents — the 100 TB design check (does wall-clock grow ~
linearly when the problem grows 10x AT CONSTANT DUP-GROUP SIZE?).

Group sizes are held constant by scaling the pattern count with n
(n_patterns = n // 16) — the make_sf1.py discipline: 10 verbatim
pattern copies would turn every dup group into a 10x clique and the
pair count quadratic, benchmarking a different problem.  Documents
come from the sf0.1 substrate (n = full table) and a 10x replica
salt (same rule make_sf1.py uses for text).

Usage: python bench_media_dedup.py   [env: SPARK_GRAFT_SF_DIR]
Prints one JSON line {family: {n: sec, 10n: sec, ratio: x}}.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from spotify_streaming_etl_pipeline_spark.llm import lines, multimodal
from spotify_streaming_etl_pipeline_spark.llm.decontam import bloom_decontam
from spotify_streaming_etl_pipeline_spark.session import get_spark
from spotify_streaming_etl_pipeline_spark.sources.catalog import load_table


def _noop(build_fn) -> float:
    """Time construction AND execution: some operators materialize
    eagerly during construction (geometry probes, checkpoints), so
    timing only the final action would under-count them."""
    t0 = time.time()
    build_fn().write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-media-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()
    # 10x replica: keys strided, tokens replica-salted (cross-replica
    # line/gram similarity collapses; within-replica structure intact)
    replicas = spark.range(10).select(F.col("id").alias("r"))
    docs10 = (
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
    out: dict[str, dict] = {}

    def leg(name, build):
        t1 = _noop(lambda: build(docs, n))
        t10 = _noop(lambda: build(docs10, 10 * n))
        out[name] = {"n_sec": t1, "n10_sec": t10, "ratio": round(t10 / max(t1, 1e-9), 2)}
        print(f"  {name}: {t1}s -> {t10}s ({out[name]['ratio']}x)", flush=True)

    leg(
        "line_dedup_decisions",
        lambda d, _n: lines.line_dedup_decisions(lines.reflow_lines(d, 3)),
    )
    leg(
        "bloom_decontam",
        lambda d, _n: bloom_decontam(
            d, d.filter(F.col("doc_id") % 10 == 0), m_bits=1 << 20, k=3
        ),
    )

    def fp_leg(name, synth, fingerprint, max_h):
        def build(d, n_docs):
            media = synth(d, n_patterns=max(13, n_docs // 16))
            return multimodal.fingerprint_near_dup(
                fingerprint(media), max_hamming=max_h
            )

        leg(name, build)

    fp_leg(
        "image_ahash_pairs",
        multimodal.synth_pattern_png_corpus,
        multimodal.image_ahash,
        4,
    )
    fp_leg(
        "audio_fingerprint_pairs",
        multimodal.synth_tone_wav_corpus,
        multimodal.audio_fingerprint,
        6,
    )
    print(json.dumps({"metric": "media_dedup_scaling", "n_docs": n, "legs": out}))


if __name__ == "__main__":
    main()
