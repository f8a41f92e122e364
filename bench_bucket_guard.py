"""Giant-bucket guard effectiveness experiment: what the star-edge
guard (llm/dedup.py:minhash_lsh_candidates(max_bucket_size=...))
actually buys on the pathology it exists for — a boilerplate
mega-bucket, the single-key quadratic surface of LSH dedup.

Corpus: ``N_UNIQUE`` distinct synthetic docs plus ``N_CLONE`` copies
of one page (the mirror-farm / bot-template shape). The clones share
every LSH band, so the unguarded candidate self-join emits
N_CLONE*(N_CLONE-1)/2 pairs from ONE (band, key) — a single-key
quadratic blowup — while the guarded plan emits N_CLONE-1 star edges
from the same bucket.

Each (form, clone-count) config runs in its OWN subprocess with a
4 GiB heap, because the honest outcome for the unguarded form at
scale is an OutOfMemoryError — which the harness records as "OOM"
instead of dying with it. Prints ONE JSON line: seconds + candidate
count (or OOM/TIMEOUT) per config.

Usage: python bench_bucket_guard.py   [env: SPARK_GRAFT_CPUS]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_UNIQUE = 20_000
CLONE_COUNTS = (2_000, 8_000, 16_000)
PER_CONFIG_TIMEOUT = 600


def run_one(form: str, n_clones: int) -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from spotify_streaming_etl_pipeline_spark.llm import dedup

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .appName("bench-bucket-guard-one")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    uniq = spark.range(N_UNIQUE).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"w{j}x"), (F.col("id") * (j + 3)) % 997)
                for j in range(12)
            ],
        ).alias("text"),
    )
    clones = spark.range(n_clones).select(
        (F.col("id") + N_UNIQUE).alias("doc_id"),
        F.lit(
            "the same boilerplate template page text repeated verbatim "
            "across every mirror of the site"
        ).alias("text"),
    )
    docs = uniq.unionByName(clones)
    cap = 512 if form == "guarded" else None
    # warmup on a tiny corpus so JVM/codegen startup isn't in the timing
    dedup.minhash_lsh_candidates(uniq.limit(500), max_bucket_size=cap).count()
    t0 = time.time()
    cnt = dedup.minhash_lsh_candidates(docs, max_bucket_size=cap).count()
    print(json.dumps({"sec": round(time.time() - t0, 2), "pairs": cnt}))


def main() -> None:
    out = {}
    for n in CLONE_COUNTS:
        row = {}
        for form in ("guarded", "unguarded"):
            cmd = [sys.executable, os.path.abspath(__file__), form, str(n)]
            try:
                r = subprocess.run(
                    cmd, capture_output=True, text=True,
                    timeout=PER_CONFIG_TIMEOUT,
                )
                lines = [
                    ln for ln in r.stdout.splitlines() if ln.startswith("{")
                ]
                if lines:
                    row[form] = json.loads(lines[-1])
                else:
                    oom = "OutOfMemoryError" in (r.stdout + r.stderr)
                    row[form] = {"sec": None, "pairs": None,
                                 "outcome": "OOM" if oom else "FAILED"}
            except subprocess.TimeoutExpired:
                row[form] = {"sec": None, "pairs": None, "outcome": "TIMEOUT"}
        out[f"clones_{n}"] = row
    print(json.dumps({"metric": "bucket_guard_crossover", "cpus": CPUS,
                      "n_unique": N_UNIQUE,
                      "per_config_timeout_s": PER_CONFIG_TIMEOUT,
                      "heap": "4g", "results": out}))


if __name__ == "__main__":
    if len(sys.argv) == 3:
        run_one(sys.argv[1], int(sys.argv[2]))
    else:
        main()
