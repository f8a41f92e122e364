"""Round-12 optimization profiler: per-stage wall-clock breakdown of
the heavy composite queries (admission_decisions, kmeans_twolevel,
recall evals, media gates) plus a generic eager-vs-plan split for any
registered query.

Generic mode (SPARK_GRAFT_PROFILE_QUERIES=a,b,c): for each query,
time (1) the fn() call — driver-side plan construction plus any EAGER
actions (localCheckpoint/collect inside the operator) — and (2) the
noop write of the returned plan.  Eager-heavy queries hide their cost
in (1); the plans/r12 *_before.txt of such queries show only a
checkpoint scan, so this split is how we attribute their time.

Stage mode (SPARK_GRAFT_PROFILE_STAGE=admission): a hand-unrolled
replay of the operator's internal stages, each materialized with the
noop sink, so the per-stage numbers sum to roughly the query's eager
wall and name which stage to optimize (guide §1).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from spotify_streaming_etl_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = os.environ.get("SPARK_GRAFT_WARM_SF_DIR", "/root/testdata/sf0.01")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def generic(spark, names: list[str]) -> None:
    import __spark_entry__ as entry

    queries = entry.queries()
    for name in names:
        fn = queries[name]
        # warm pass (codegen + JIT)
        _noop(fn(spark, WARM_DIR))
        spark.catalog.clearCache()
        build_s, write_s = [], []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            _noop(df)
            t2 = time.perf_counter()
            build_s.append(t1 - t0)
            write_s.append(t2 - t1)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        print(
            f"{name}: eager/build {statistics.median(build_s):.2f}s  "
            f"noop-write {statistics.median(write_s):.2f}s  "
            f"(runs build={[round(x, 2) for x in build_s]} "
            f"write={[round(x, 2) for x in write_s]})",
            flush=True,
        )


def stage_admission(spark) -> None:
    """Unrolled admission_decisions at sf0.1: name the expensive stage."""
    from spotify_streaming_etl_pipeline_spark.llm import dedup
    from spotify_streaming_etl_pipeline_spark.plans.llm_shared import _docs

    d = _docs(spark, SF_DIR)
    batch = d.filter(F.col("doc_id") % 5 == 0)
    corpus = d.filter(F.col("doc_id") % 5 != 0)

    def t(label, thunk):
        t0 = time.perf_counter()
        out = thunk()
        dt = time.perf_counter() - t0
        print(f"  {label}: {dt:.2f}s", flush=True)
        return out

    spark.sparkContext.setJobDescription("profile: admission stages")
    batch_d = batch.dropDuplicates(["doc_id"])
    fresh = batch_d.join(corpus.select("doc_id"), "doc_id", "left_anti")
    bp = dedup._posting(fresh, "text").persist()
    t("batch posting build+persist", lambda: bp.count())
    cp = dedup._posting(corpus, "text").persist()
    t("corpus posting build+persist", lambda: cp.count())
    corpus_bands = dedup.minhash_band_table(corpus, text_col="text", _posting_df=cp)
    t("corpus bands (noop)", lambda: _noop(corpus_bands))
    new_bands = dedup.minhash_band_table(fresh, text_col="text", _posting_df=bp)
    t("batch bands (noop)", lambda: _noop(new_bands))
    cands = dedup.incremental_band_candidates(
        corpus_bands, new_bands, max_bucket_size=dedup.LSH_MAX_BUCKET
    )
    t("incremental band candidates (noop)", lambda: _noop(cands))
    verified = dedup.pair_jaccard(cp, cands, posting_b=bp).filter(
        F.col("jaccard") >= 0.8
    )
    t("pair_jaccard verify (noop)", lambda: _noop(verified))
    corpus_dup = (
        verified.select(F.col("doc_b").alias("doc_id")).distinct().persist()
    )
    t("corpus_dup distinct+persist", lambda: corpus_dup.count())
    surv = fresh.join(corpus_dup, "doc_id", "left_anti")
    surv_posting = bp.join(surv.select("doc_id"), "doc_id", "left_semi")
    pairs = dedup.minhash_near_dup(
        surv,
        threshold=0.8,
        text_col="text",
        max_bucket_size=dedup.LSH_MAX_BUCKET,
        _posting_df=surv_posting,
    )
    t("intra-batch near-dup (noop)", lambda: _noop(pairs))
    clusters = t("dup_clusters (eager)", lambda: dedup.dup_clusters(pairs))
    t("clusters noop", lambda: _noop(clusters))
    spark.sparkContext.setJobDescription(None)


def main() -> None:
    spark = get_spark("profile-r12")
    spark.sparkContext.setLogLevel("ERROR")
    stage = os.environ.get("SPARK_GRAFT_PROFILE_STAGE")
    if stage == "admission":
        # one warm pass at sf0.01, then the profiled pass at sf0.1
        global SF_DIR
        keep = SF_DIR
        SF_DIR = WARM_DIR
        print("warm pass (sf0.01):", flush=True)
        stage_admission(spark)
        SF_DIR = keep
        print(f"profiled pass ({SF_DIR}):", flush=True)
        stage_admission(spark)
        return
    names = [
        s.strip()
        for s in os.environ.get("SPARK_GRAFT_PROFILE_QUERIES", "").split(",")
        if s.strip()
    ]
    if names:
        generic(spark, names)


if __name__ == "__main__":
    main()
