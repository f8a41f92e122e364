"""Bucketed co-located join: the fact⋈fact shuffle disappears when
both sides are bucketed on the join key with equal bucket counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spotify_streaming_etl_pipeline_spark.operators.bucketing import (
    cobucketed_join,
    has_shuffle,
    write_bucketed,
)
from spotify_streaming_etl_pipeline_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    write_bucketed(
        li, "b_lineitem", ["l_orderkey"], 8,
        sort_cols=["l_orderkey"], path=str(base / "li"),
    )
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "b_orders", ["l_orderkey"], 8,
        sort_cols=["l_orderkey"], path=str(base / "o"),
    )
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_cobucketed_join_has_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    # Disable auto-broadcast so the test proves bucketing (not a
    # broadcast) removed the exchanges.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cobucketed_join(spark, left, right, ["l_orderkey"])
        assert not has_shuffle(joined), "bucketed join must not shuffle"
        # and it still computes the right thing
        n = joined.count()
        li = spark.table(left)
        assert n == li.count()  # every lineitem matches exactly one order
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    """Control: the same join over plain parquet reads shuffles both
    sides (what bucketing removes)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
        o = load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"
        )
        assert has_shuffle(li.join(o, ["l_orderkey"]))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_aggregation_skips_shuffle(spark, bucketed_tables):
    """groupBy on the bucket key over a bucketed table also avoids the
    exchange — partial and final aggregation collapse into one stage."""
    left, _ = bucketed_tables
    agg = spark.table(left).groupBy("l_orderkey").agg(F.sum("l_quantity"))
    assert not has_shuffle(agg)
