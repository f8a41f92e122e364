"""Bucketed storage for shuffle-free co-located joins (SURVEY §4 /
scale posture).

Fact⋈fact joins (lineitem⋈orders-shaped) are the one plan in this
engine that must shuffle both sides at query time. When such a join
runs repeatedly, pre-bucketing both tables by the join key amortizes
that shuffle into the write: Spark's bucketed scan exposes the
hash-partitioning to the planner, so the join compiles to a
sort-merge (or shuffled-hash) join with NO Exchange on either side.
At 100 TB this turns the dominant per-query network cost into a
one-time layout cost.

Rules for the elimination to fire (asserted in tests):
- both tables bucketed on the join keys with the SAME bucket count;
- ``spark.sql.sources.bucketing.enabled`` on (default);
- tables read through the catalog (``spark.table``), not raw paths —
  bucket metadata lives in the table definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist as a bucketed (optionally sorted) catalog table.
    Sorting within buckets additionally removes the join's Sort nodes
    and speeds min/max pruning."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    keys: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket keys —
    plans without a shuffle Exchange when the layout contract holds."""
    return spark.table(left_table).join(spark.table(right_table), keys, how)


def has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle Exchange (test and
    plan-audit helper)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan or "Exchange rangepartitioning" in plan
