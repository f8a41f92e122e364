"""r13 scale leg for the DISTRIBUTED dup_clusters path (VERDICT r12
item 9): the suite only ever times the driver-collect branch (near-dup
edge sets at sf0.1 are far below collect_max_edges), so this leg
forces the min-label-propagation fallback end to end at sf0.1 AND at
the 10x substrate (make_sf1.py output), and cross-checks its output
against the driver-collect branch on the same pair set.

Usage:
    python make_sf1.py                      # once, builds /tmp/spark_graft_sf1
    python bench_cc_distributed_r13.py      # prints one JSON line

Timed region per scale: pair detection is materialized FIRST (the
pairs table is persisted and counted), so the reading isolates the
clustering loop itself — both branches then consume identical cached
edges.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from spotify_streaming_etl_pipeline_spark.llm import dedup  # noqa: E402
from spotify_streaming_etl_pipeline_spark.plans.llm_shared import _docs  # noqa: E402
from spotify_streaming_etl_pipeline_spark.session import get_spark  # noqa: E402

SCALES = {
    "sf0.1": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    "sf1": os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1"),
}


def main() -> None:
    spark = get_spark("cc-distributed-r13")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    for label, sf_dir in SCALES.items():
        if not os.path.isdir(sf_dir):
            out[label] = {"skipped": f"missing {sf_dir}"}
            continue
        docs = _docs(spark, sf_dir)
        pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.8).persist()
        n_pairs = pairs.count()  # materialize detection outside the timing
        spark.sparkContext.setJobDescription(f"cc distributed {label}")
        t0 = time.perf_counter()
        dist = dedup.dup_clusters(pairs, distributed=True)
        dist.write.format("noop").mode("overwrite").save()
        t_dist = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(f"cc driver {label}")
        t0 = time.perf_counter()
        drv = dedup.dup_clusters(pairs, distributed=False)
        drv.write.format("noop").mode("overwrite").save()
        t_drv = time.perf_counter() - t0
        # Equivalence: both branches must produce the identical table.
        diff = dist.exceptAll(drv).count() + drv.exceptAll(dist).count()
        out[label] = {
            "n_pairs": n_pairs,
            "distributed_sec": round(t_dist, 2),
            "driver_sec": round(t_drv, 2),
            "diff_rows": diff,
        }
        pairs.unpersist()
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"metric": "cc_distributed_leg", "scales": out}))
    spark.stop()


if __name__ == "__main__":
    main()
