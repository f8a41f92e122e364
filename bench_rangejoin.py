"""A/B: binned interval join (operators/rangejoin.py) vs Spark's
native plan for the same keyless range predicate (broadcast nested
loop) — the measurement behind PLANS.md's round-4 claim.

Setup mirrors the registered `interval_join_binned` query but scales
the interval side up (events x N) so the pair stream dominates; the
probe side stays the sf0.1 purchases. Run:

    python bench_rangejoin.py            # sf0.1, factors 1 and 4
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from pyspark.sql import functions as F

    from spotify_streaming_etl_pipeline_spark.functions.scalar import epoch_of
    from spotify_streaming_etl_pipeline_spark.operators.rangejoin import (
        interval_join,
    )
    from spotify_streaming_etl_pipeline_spark.session import get_spark
    from spotify_streaming_etl_pipeline_spark.sources.catalog import load_table

    spark = get_spark("bench-rangejoin")
    spark.sparkContext.setLogLevel("ERROR")

    half = 30 * 60 * 1000
    ev = load_table(spark, sf_dir, "events")
    ems = epoch_of(ev.schema["ts"].dataType, F.col("ts"), "MILLISECOND")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), ems.alias("pms"))
        .persist()
    )
    purchases.count()

    def errors_scaled(factor: int):
        e = ev.filter(F.col("event_type") == "error").select(
            F.col("event_id").alias("error_id"),
            (ems - half).alias("start_ms"),
            (ems + half).alias("end_ms"),
        )
        if factor > 1:
            e = e.crossJoin(
                spark.range(factor).select(F.col("id").alias("_rep"))
            ).select(
                (F.col("error_id") * factor + F.col("_rep")).alias("error_id"),
                "start_ms",
                "end_ms",
            )
        return e.persist()

    def timed(df) -> float:
        df.write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(2):
            t = time.time()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t)
        return round(best, 3)

    results = {}
    for factor in (1, 4):
        errs = errors_scaled(factor)
        n_intervals = errs.count()  # materializes the persisted frame
        exact = (
            (F.col("pms") >= F.col("start_ms"))
            & (F.col("pms") < F.col("end_ms"))
        )
        naive = (
            purchases.join(errs, exact, "inner")
            .groupBy("purchase_id")
            .agg(F.count(F.lit(1)).alias("n"), F.min("error_id").alias("m"))
        )
        binned = (
            interval_join(
                purchases, errs, "pms", "start_ms", "end_ms", half
            )
            .groupBy("purchase_id")
            .agg(F.count(F.lit(1)).alias("n"), F.min("error_id").alias("m"))
        )
        assert "BroadcastNestedLoopJoin" in naive._jdf.queryExecution().executedPlan().toString()
        results[f"x{factor}"] = {
            "naive_bnlj_s": timed(naive),
            "binned_s": timed(binned),
            "n_intervals": n_intervals,
        }
        errs.unpersist()
    purchases.unpersist()
    print(json.dumps({"sf_dir": sf_dir, **results}))


if __name__ == "__main__":
    main()
