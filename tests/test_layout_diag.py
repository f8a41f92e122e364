"""Unit semantics for the batch of layout/diagnostic queries:
z-order locality bounds, aggregation-argmax determinism, skew-profile
invariants, lang-ID confusion diagonal.  (Value parity vs DuckDB is
in test_oracle_parity.py.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_streaming_etl_pipeline_spark.plans import llm_evals, quality


def test_zorder_buckets_bound_both_dimensions(spark, sf_dir):
    rows = quality.zorder_locality(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # top-6-of-16 z-bits keep the top 3 bits of EACH 8-bit coord:
        # every bucket spans at most 2^5 = 32 values per dimension
        assert r.pk_max - r.pk_min <= 31, r
        assert r.sk_max - r.sk_min <= 31, r


def test_zorder_layout_files_bound_both_dimensions(spark, sf_dir, tmp_path):
    from spotify_streaming_etl_pipeline_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    out = str(tmp_path / "zordered")
    quality.zorder_layout(li, "l_partkey", "l_suppkey", 16).write.mode(
        "overwrite"
    ).parquet(out)
    back = spark.read.parquet(out)
    # each output file covers a bounded range of the Morton key, hence
    # a bounded span in both dims; with 16 range partitions over a
    # 16-bit key each file spans ≤ 4096 z-values → ≤ 64 per dimension
    per_file = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(
            (F.max(F.col("l_partkey") % 256) - F.min(F.col("l_partkey") % 256)).alias("ps"),
            (F.max(F.col("l_suppkey") % 256) - F.min(F.col("l_suppkey") % 256)).alias("ss"),
        )
        .collect()
    )
    assert per_file
    assert all(r.ps <= 64 and r.ss <= 64 for r in per_file), per_file


def test_top_part_per_supplier_unique_and_argmax(spark, sf_dir):
    from spotify_streaming_etl_pipeline_spark.sources.catalog import load_table

    top = quality.top_part_per_supplier(spark, sf_dir)
    rows = top.collect()
    supps = [r.l_suppkey for r in rows]
    assert len(supps) == len(set(supps))  # exactly one row per supplier
    # spot-check one supplier against a direct computation
    li = load_table(spark, sf_dir, "lineitem")
    s0 = rows[0].l_suppkey
    best = (
        li.filter(F.col("l_suppkey") == s0)
        .groupBy("l_partkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
            .alias("rc")
        )
        .orderBy(F.desc("rc"), F.desc("l_partkey"))
        .first()
    )
    assert rows[0].top_partkey == best.l_partkey
    assert rows[0].revenue_cents == best.rc


def test_key_skew_profile_invariants(spark, sf_dir):
    r = quality.key_skew_profile(spark, sf_dir).collect()[0]
    assert r.n_rows >= r.n_keys > 0
    assert r.max_cnt >= r.p99_cnt >= r.p50_cnt
    assert r.skew_ratio >= 1.0


def test_langid_confusion_rows_share_sums_to_one(spark, sf_dir):
    rows = llm_evals.langid_confusion(spark, sf_dir).collect()
    by_label: dict[str, float] = {}
    for r in rows:
        by_label[r.lang_label] = by_label.get(r.lang_label, 0.0) + r.row_share
    for label, total in by_label.items():
        assert abs(total - 1.0) < 0.01, (label, total)
