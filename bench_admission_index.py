"""Admission posting-index experiment: what the maintained corpus
posting index (streaming/admission.py, ``{state_dir}/posting_index``)
buys per microbatch over re-deriving the posting from the corpus
snapshot.

Setup mirrors the production stream steady state: a corpus of
``N_CORPUS`` documents already admitted (snapshot + posting index both
on parquet, exactly what ``dedup_admission_sink`` maintains), and a
``N_BATCH``-doc microbatch to admit.  The DERIVED form re-shingles the
whole corpus inside ``_decide`` (the pre-r9 sink behavior); the INDEX
form reads the posting parquet — the per-batch cost drops from
corpus-proportional to batch-proportional + index scan.

``CORPUS_MULT`` grows the corpus by unioning shifted-id copies (texts
made distinct with a copy-tag token) — the steady-state shape where
the corpus dwarfs the batch and the derived form's re-shingle term
dominates.

Prints ONE JSON line: median seconds per form over ``N_RUNS`` runs.

Usage: python bench_admission_index.py   [env: SPARK_GRAFT_SF_DIR,
SPARK_GRAFT_CPUS, CORPUS_MULT]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_RUNS = 3


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import tempfile

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from spotify_streaming_etl_pipeline_spark.llm import dedup
    from spotify_streaming_etl_pipeline_spark.streaming.admission import (
        admission_decisions,
    )

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.driver.memory", "8g")
        .appName("bench-admission-index")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    mult = int(os.environ.get("CORPUS_MULT", "1"))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    base = docs.filter(F.col("doc_id") % 5 != 0)
    corpus_df = base
    for m in range(1, mult):
        corpus_df = corpus_df.unionByName(
            base.select(
                (F.col("doc_id") + m * 1_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" copytag{m}")).alias("text"),
            )
        )

    tmp = tempfile.mkdtemp(prefix="admission_bench_")
    corpus_path = os.path.join(tmp, "corpus")
    posting_path = os.path.join(tmp, "posting")
    corpus_df.write.parquet(corpus_path)
    dedup._posting(spark.read.parquet(corpus_path), "text").write.parquet(
        posting_path
    )

    corpus = spark.read.parquet(corpus_path)
    n_corpus, n_batch = corpus.count(), batch.count()

    def timed(supply_index: bool) -> float:
        posting = (
            spark.read.parquet(posting_path) if supply_index else None
        )
        t0 = time.monotonic()
        # admission_decisions shares _decide with the sink; its
        # localCheckpoint materializes the whole decision pipeline.
        dec = admission_decisions(
            batch, corpus, threshold=0.8,
        ) if posting is None else _with_index(batch, corpus, posting)
        n = dec.count()
        dt = time.monotonic() - t0
        assert n == n_batch
        return dt

    def _with_index(b, c, p):
        from spotify_streaming_etl_pipeline_spark.streaming.admission import (
            _decide,
        )

        decisions, cleanup = _decide(b, c, 0.8, "text", corpus_posting=p)
        out = decisions.localCheckpoint(eager=True)
        for df in cleanup:
            df.unpersist()
        return out

    results = {}
    for form, supply in (("derived", False), ("index", True)):
        times = [timed(supply) for _ in range(N_RUNS)]
        results[form] = round(statistics.median(times), 3)
    print(
        json.dumps(
            {
                "metric": "admission_batch_seconds_median",
                "n_corpus": n_corpus,
                "n_batch": n_batch,
                "sf_dir": SF_DIR,
                "runs": N_RUNS,
                **results,
                "speedup": round(results["derived"] / results["index"], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
