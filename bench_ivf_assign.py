"""IVF assignment crossover experiment: relational (posexplode join)
vs Arrow-batched (mapInPandas matmul) cell assignment
(llm/similarity.py:_ivf_from_centroid_table vs assign_cells_arrow,
VERDICT r5 directive #4).

Prints ONE JSON line with wall-clock seconds per (amplification,
form).  The embeddings table is tiny (2k rows at sf0.1), so the corpus
is row-amplified to the regimes where the two plans diverge: the
relational form posexplodes every vector into (vec_id, dim, x) rows —
a 64x row inflation feeding a broadcast join + groupBy — while the
arrow form scores all cells with one BLAS matmul per Arrow batch and
never inflates.  Both materialize through the noop sink after a warm
pass, min of 2 timed runs.

Usage: python bench_ivf_assign.py  [env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS]
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from spotify_streaming_etl_pipeline_spark.llm.ivf_fixture import IVF_CENTROIDS
from spotify_streaming_etl_pipeline_spark.llm.similarity import (
    assign_cells_arrow,
)
from spotify_streaming_etl_pipeline_spark.session import get_spark
from spotify_streaming_etl_pipeline_spark.sources.catalog import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
AMPS = (16, 128)  # 32k and 256k vectors (x64 = 2M / 16M relational rows)


def _amplified(spark, amp: int):
    emb = load_table(spark, SF_DIR, "embeddings")
    return (
        emb.withColumn("_a", F.explode(F.sequence(F.lit(1), F.lit(amp))))
        .select(
            (F.col("vec_id") * amp + F.col("_a")).alias("vec_id"),
            "embedding",
        )
        .repartition(32)
    )


def _relational_assign(spark, emb):
    from pyspark.sql import Window

    cents = spark.createDataFrame(
        [
            (cell, dim, float(c))
            for cell, row in enumerate(IVF_CENTROIDS)
            for dim, c in enumerate(row)
        ],
        "cell int, dim int, c double",
    )
    dims = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x"),
    )
    d2 = (
        dims.join(F.broadcast(cents), "dim")
        .groupBy("vec_id", "cell")
        .agg(
            F.round(
                F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))), 4
            ).alias("d2")
        )
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "cell")
    return (
        d2.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell")
    )


def main() -> None:
    spark = get_spark("bench-ivf-assign")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float] = {}
    for amp in AMPS:
        emb = _amplified(spark, amp)
        for form, make in (
            ("relational", lambda: _relational_assign(spark, emb)),
            ("arrow", lambda: assign_cells_arrow(emb, IVF_CENTROIDS)),
        ):
            times = []
            for i in range(3):  # first run is the warm pass
                start = time.perf_counter()
                make().write.format("noop").mode("overwrite").save()
                times.append(time.perf_counter() - start)
            out[f"amp{amp}_{form}"] = round(min(times[1:]), 3)
    print(json.dumps({"metric": "ivf_assign_crossover", "sf_dir": SF_DIR, **out}))
    spark.stop()


if __name__ == "__main__":
    main()
