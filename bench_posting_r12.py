"""Round-12 posting-form A/B: three builds of the shingle posting
table plus their downstream consumers, timed with the noop sink.

Forms:
  A: shipped zip-explode + md5-per-occurrence + repartition(doc_id)
     + dropDuplicates (HEAD).
  B: per-doc array_distinct on gram strings BEFORE explode (md5 per
     DISTINCT gram), keep repartition(doc_id).
  C: form B without the repartition — consumers pay (partial-agg)
     exchanges instead.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from spotify_streaming_etl_pipeline_spark.llm import dedup  # noqa: E402
from spotify_streaming_etl_pipeline_spark.plans.llm_shared import _docs  # noqa: E402
from spotify_streaming_etl_pipeline_spark.session import get_spark  # noqa: E402

N = dedup.NGRAM_N


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _grams_narrow(df: DataFrame, text_col: str, n: int = N) -> DataFrame:
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    length = F.greatest(F.lit(0), F.size("t") - (n - 1))
    arr = F.arrays_zip(*[F.slice(F.col("t"), j + 1, length) for j in range(n)])
    gstr = F.transform(
        arr, lambda s: F.concat_ws("|", *[s[str(j)] for j in range(n)])
    )
    return df.select("doc_id", toks.alias("t")).select(
        "doc_id", F.explode(F.array_distinct(gstr)).alias("_g")
    ).select(
        "doc_id", F.md5("_g").alias("_md5")
    ).select(
        "doc_id",
        F.conv(F.substring("_md5", 1, 12), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring("_md5", 13, 12), 16, 10).cast("long").alias("h2"),
    )


def posting_b(df, text_col="text"):
    return _grams_narrow(df, text_col).repartition("doc_id")


def posting_c(df, text_col="text"):
    return _grams_narrow(df, text_col)


FORMS = {
    "A(head)": lambda d: dedup._posting(d, "text"),
    "B(narrow+rep)": posting_b,
    "C(narrow)": posting_c,
}


def _time(spark, label, fn, runs=3):
    spark.sparkContext.setJobDescription(label)
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    med = statistics.median(samples)
    print(f"{med:8.3f}s  {label}  runs={[round(s, 3) for s in samples]}", flush=True)
    return med


def run(spark, sf_dir):
    d = _docs(spark, sf_dir)
    for name, build in FORMS.items():
        _time(spark, f"{name}: build only", lambda: _noop(build(d)))

    for name, build in FORMS.items():
        def sig_run():
            p = build(d).persist()
            _noop(dedup.minhash_signatures(d, _posting_df=p))
            p.unpersist()
        _time(spark, f"{name}: build+signatures", sig_run)

    for name, build in FORMS.items():
        def bucket_run():
            p = build(d).persist()
            _noop(dedup.posting_buckets(p, 1000))
            p.unpersist()
        _time(spark, f"{name}: build+bucket fold", bucket_run)

    for name, build in FORMS.items():
        def near_run():
            p = build(d).persist()
            _noop(dedup.minhash_near_dup(d, threshold=0.8, _posting_df=p))
            p.unpersist()
        _time(spark, f"{name}: FULL minhash_near_dup", near_run)

    # Parity probe: forms must emit identical posting row sets.
    a = dedup._posting(d, "text")
    c = posting_c(d, "text")
    diff = a.exceptAll(c).count() + c.exceptAll(a).count()
    print(f"parity exceptAll diff rows: {diff}", flush=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("posting-ab-r12")
    spark.sparkContext.setLogLevel("ERROR")
    print("== warm (sf0.001)", flush=True)
    run(spark, "/root/testdata/sf0.001")
    print(f"== timed ({sf_dir})", flush=True)
    run(spark, sf_dir)
    spark.stop()


if __name__ == "__main__":
    main()
