"""Build an sf1 (10x sf0.1) benchmark substrate by deterministic
replication of the driver-generated sf0.1 tables into
$SPARK_GRAFT_SF1_DIR (default /tmp/spark_graft_sf1) — the 10x point
that pins the scaling curves the 100 TB extrapolation rests on
(VERDICT r5 directive #5).  The source testdata is READ-ONLY; this
writes only under /tmp.

Replication rules (replica r in 0..9) keep query semantics honest at
10x instead of exploding them:

- keys offset by r x (max_key+1) per table, foreign keys offset with
  their parent's stride — referential integrity is preserved, joins
  fan out 10x, dims grow 10x (the sf1 shape, like TPC-H);
- documents: every token is salted with the replica id, so
  within-replica near-dup structure is IDENTICAL to sf0.1 while
  cross-replica similarity collapses to ~0.  Without this, 10
  verbatim copies of each doc turn every near-dup group into a
  10-clique and the pair count grows ~100x — that would benchmark a
  different (quadratic) problem, not 10x the same one;
- embeddings: dimension 0 perturbed by r/1000 (breaks exact ties,
  preserves geometry);
- events: event ids offset, timestamps unchanged (the window
  queries see 10x density, same span — how a busier day looks).

Usage: python make_sf1.py   [env: SPARK_GRAFT_SF_DIR (source),
SPARK_GRAFT_SF1_DIR (dest)]
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from spotify_streaming_etl_pipeline_spark.session import get_spark
from spotify_streaming_etl_pipeline_spark.sources.catalog import load_table

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
N_REPLICAS = 10

# key column -> stride source table (None = own table's max+1)
OFFSETS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
KEY_COL = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def main() -> None:
    spark = get_spark("make-sf1")
    spark.sparkContext.setLogLevel("ERROR")

    strides = {
        t: load_table(spark, SRC, t).agg(
            (F.max(k) + 1).cast("long")
        ).first()[0]
        for t, k in KEY_COL.items()
    }

    def replicate(name: str) -> DataFrame:
        df = load_table(spark, SRC, name)
        rep = df.withColumn(
            "_r", F.explode(F.sequence(F.lit(0), F.lit(N_REPLICAS - 1)))
        )
        for col, parent in OFFSETS.get(name, {}).items():
            rep = rep.withColumn(
                col,
                (F.col(col) + F.col("_r") * F.lit(strides[parent])).cast(
                    df.schema[col].dataType
                ),
            )
        if name == "documents":
            rep = rep.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w: F.concat(F.lit("r"), F.col("_r"), w),
                    ),
                    " ",
                ),
            )
        if name == "embeddings":
            rep = rep.withColumn(
                "embedding",
                F.concat(
                    F.array(
                        (
                            F.element_at("embedding", 1)
                            + F.col("_r").cast("float") / F.lit(1000.0)
                        ).cast("float")
                    ),
                    F.slice("embedding", 2, 63),
                ),
            )
        return rep.drop("_r")

    os.makedirs(DST, exist_ok=True)
    for name in ("region", "nation"):
        load_table(spark, SRC, name).write.mode("overwrite").parquet(
            f"{DST}/{name}.parquet"
        )
    for name in OFFSETS:
        replicate(name).repartition(32).write.mode("overwrite").parquet(
            f"{DST}/{name}.parquet"
        )
        print(name, "written")
    spark.stop()


if __name__ == "__main__":
    main()
