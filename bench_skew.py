"""Skew-join crossover experiment: plain vs salted join at two skew
levels (operators/skew.py:salted_join, VERDICT r3 directive #6).

Prints ONE JSON line with wall-clock seconds per (skew level, form).

Setup mirrors the case salting exists for — a hot key joining a
broadcast-UNFRIENDLY side: autoBroadcastJoinThreshold=-1 forces a
shuffle join (with broadcast available there is no join-side skew
problem at all), and AQE's own skew-join splitting is toggled so the
table separates what explicit salting buys from what AQE already
fixes. Skew levels:

- natural:  lineitem ⋈ part as generated (near-uniform partkeys)
- hot90:    90% of lineitem rows rewritten to one partkey — the
            single-straggler regime

The fact side is row-amplified ``AMP``× (explode of a sequence) so the
hot partition is large enough for the straggler to dominate on
local[32] — at raw sf0.1 (~600k rows) every partition fits in one
task-second and skew is invisible. Forms: plain equi-join vs
salted_join(n_salts=32), each aggregated to a single row (count + sum)
so the join dominates; each config is timed twice after a JVM warmup
and the min is reported.
Usage: python bench_skew.py   [env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS]
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from spotify_streaming_etl_pipeline_spark.operators.skew import salted_join
from spotify_streaming_etl_pipeline_spark.sources.catalog import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
HOT_KEY = 1
AMP = 16


def _big(spark: SparkSession, level: str):
    li = (
        load_table(spark, SF_DIR, "lineitem")
        .select(F.col("l_partkey").alias("partkey"), "l_quantity", "l_orderkey")
        .withColumn("_amp", F.explode(F.sequence(F.lit(1), F.lit(AMP))))
    )
    if level == "hot90":
        li = li.withColumn(
            "partkey",
            F.when(F.pmod("l_orderkey", F.lit(10)) < 9, F.lit(HOT_KEY)).otherwise(
                F.col("partkey")
            ),
        )
    return li


def _run(spark: SparkSession, level: str, form: str) -> float:
    big = _big(spark, level)
    small = load_table(spark, SF_DIR, "part").select(
        F.col("p_partkey").alias("partkey"), "p_brand"
    )
    if form == "salted":
        joined = salted_join(big, small, ["partkey"])
    else:
        joined = big.join(small, ["partkey"])
    best = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        joined.agg(
            F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s")
        ).collect()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("skew-crossover")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # JVM / codegen warmup so the first measured config isn't penalized
    _run(spark, "natural", "plain")
    out: dict[str, float] = {}
    for level in ("natural", "hot90"):
        for aqe_skew in ("off", "on"):
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.enabled",
                "true" if aqe_skew == "on" else "false",
            )
            for form in ("plain", "salted"):
                key = f"{level}/{form}/aqe_skew_{aqe_skew}"
                out[key] = _run(spark, level, form)
    print(
        json.dumps(
            {"metric": "skew_join_crossover", "unit": "sec", "sf_dir": SF_DIR, "runs": out}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
