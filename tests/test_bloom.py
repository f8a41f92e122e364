"""Units for bloom-filter decontamination (llm/decontam.py:
bloom_decontam): the bounded-bits property, exact-membership hits,
false-positive honesty, and short-document rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_streaming_etl_pipeline_spark.llm.decontam import (
    bloom_bits,
    bloom_decontam,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bloom_bits_bounded_by_m(spark):
    bench = _df(spark, [(i, f"w{i} w{i+1} w{i+2} w{i+3} w{i+4}") for i in range(40)])
    n = bloom_bits(bench, m_bits=16, k=4).count()
    assert n <= 16  # 120 grams x 4 probes collapse into <= m bits


def test_benchmark_member_doc_saturates(spark):
    bench = _df(spark, [(1, "alpha beta gamma delta epsilon")])
    corpus = _df(
        spark,
        [
            (10, "alpha beta gamma delta epsilon"),  # verbatim copy
            (11, "zeta eta theta iota kappa lambda"),
        ],
    )
    out = {r.doc_id: r for r in bloom_decontam(corpus, bench, m_bits=65536, k=4).collect()}
    assert out[10].hit_ratio == 1.0 and out[10].flagged
    # disjoint vocabulary at a roomy filter: overwhelmingly no hits
    assert out[11].n_hits <= 1 and not out[11].flagged


def test_tiny_filter_reports_false_positives(spark):
    """At m=2 every bit is set by any benchmark, so EVERY corpus gram
    'hits' — the operator must report the saturation, not mask it."""
    bench = _df(spark, [(1, "alpha beta gamma delta")])
    corpus = _df(spark, [(10, "completely different words here now")])
    row = bloom_decontam(corpus, bench, m_bits=2, k=2).collect()[0]
    assert row.hit_ratio == 1.0 and row.flagged  # honest FP saturation


def test_short_docs_keep_rows_with_zero_grams(spark):
    bench = _df(spark, [(1, "alpha beta gamma delta")])
    corpus = _df(spark, [(10, "one two"), (11, "alpha beta gamma")])
    out = {r.doc_id: r for r in bloom_decontam(corpus, bench).collect()}
    assert out[10].n_grams == 0 and out[10].hit_ratio is None
    assert not out[10].flagged
    assert out[11].n_grams == 1 and out[11].n_hits == 1


def test_probe_matches_exact_containment_at_large_m(spark):
    """With a roomy filter the bloom answer equals exact containment:
    hits = corpus grams literally present in the benchmark."""
    bench = _df(spark, [(1, "a b c d e"), (2, "x y z w v")])
    corpus = _df(spark, [(10, "a b c x y z q r s")])
    row = bloom_decontam(corpus, bench, m_bits=1 << 20, k=4).collect()[0]
    # grams of doc 10: a|b|c b|c|x c|x|y x|y|z y|z|q z|q|r q|r|s -> 7
    # present in bench: a|b|c, x|y|z -> 2
    assert (row.n_grams, row.n_hits) == (7, 2)
