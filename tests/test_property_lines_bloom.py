"""Property-based pins for the round-9 curation families: random
corpora replayed against independent Python models of line-level
dedup, the C4 doc gate, bloom decontamination, and banded fingerprint
near-dup recall."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from spotify_streaming_etl_pipeline_spark.llm import lines, multimodal
from spotify_streaming_etl_pipeline_spark.llm.decontam import bloom_decontam

PROPS = settings(max_examples=5, deadline=None)

WORDS = ["alpha", "beta", "gamma", "delta", "run", "jump"]

line_strat = st.lists(
    st.sampled_from(WORDS), min_size=0, max_size=4
).map(" ".join)
doc_strat = st.lists(line_strat, min_size=1, max_size=6).map("\n".join)
corpus_strat = st.lists(doc_strat, min_size=1, max_size=12)


def _model_line_dedup(texts):
    """Python model: first (doc order, line order) occurrence of each
    trimmed non-blank line wins."""
    seen = set()
    out = {}
    for doc_id, text in enumerate(texts):
        kept = []
        n_lines = 0
        for raw in text.split("\n"):
            line = raw.strip()
            if not line:
                continue
            n_lines += 1
            if line not in seen:
                seen.add(line)
                kept.append(line)
        out[doc_id] = (n_lines, len(kept), "\n".join(kept))
    return out


@PROPS
@given(corpus_strat)
def test_line_dedup_matches_python_model(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_lines, r.n_kept, r.clean_text)
        for r in lines.line_dedup(df).collect()
    }
    assert got == _model_line_dedup(texts)


@PROPS
@given(corpus_strat)
def test_line_dedup_decisions_keep_exactly_one_per_content(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    dec = lines.line_dedup_decisions(df).collect()
    lt = {
        (r.doc_id, r.line_no): r.line
        for r in lines.line_table(df).collect()
    }
    by_content: dict[str, list] = {}
    for r in dec:
        by_content.setdefault(lt[(r.doc_id, r.line_no)], []).append(r)
    for content, rows in by_content.items():
        keepers = [r for r in rows if r.kept]
        assert len(keepers) == 1, content
        # the keeper is the lexicographically-first occurrence
        assert (keepers[0].doc_id, keepers[0].line_no) == min(
            (r.doc_id, r.line_no) for r in rows
        )
        assert {r.n_copies for r in rows} == {len(rows)}


def _grams(text, n=3):
    w = [t for t in text.split(" ") if t]
    return {"|".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def _bloom_model(corpus, bench, m, k):
    def bits(g):
        h = hashlib.md5(g.encode()).hexdigest()
        h1, h2 = int(h[:12], 16), int(h[12:24], 16)
        return {(h1 + i * h2) % m for i in range(k)}

    table = set()
    for t in bench:
        for g in _grams(t):
            table |= bits(g)
    out = {}
    for doc_id, t in enumerate(corpus):
        gs = _grams(t)
        hits = sum(1 for g in gs if bits(g) <= table)
        out[doc_id] = (len(gs), hits)
    return out


@PROPS
@given(
    st.lists(
        st.lists(st.sampled_from(WORDS), min_size=0, max_size=12).map(
            " ".join
        ),
        min_size=1,
        max_size=10,
    ),
    st.integers(min_value=0, max_value=3),
)
def test_bloom_decontam_matches_python_model(spark, texts, n_bench):
    corpus = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    bench_rows = [(i, t) for i, t in enumerate(texts[:n_bench])]
    bench = spark.createDataFrame(
        bench_rows or [(0, "")], "doc_id long, text string"
    )
    m, k = 64, 2  # tiny filter: false positives guaranteed in play
    got = {
        r.doc_id: (r.n_grams, r.n_hits)
        for r in bloom_decontam(corpus, bench, m_bits=m, k=k).collect()
    }
    assert got == _bloom_model(texts, [t for _, t in bench_rows], m, k)


@PROPS
@given(
    st.lists(
        st.lists(
            st.integers(min_value=0, max_value=255), min_size=8, max_size=8
        ),
        min_size=2,
        max_size=10,
        unique_by=tuple,
    ),
    st.integers(min_value=0, max_value=10),
)
def test_fingerprint_near_dup_equals_brute_force(spark, fps, t):
    """Banded recall == brute force for ANY fingerprint set and any
    threshold (pigeonhole) — hamming computed by a Python model."""
    ah = spark.createDataFrame(
        [(i, b, "") for i, b in enumerate(fps)],
        "doc_id long, bands array<int>, ahash_hex string",
    )
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in multimodal.ahash_near_dup(ah, max_hamming=t).collect()
    }
    want = {}
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            ham = sum(
                bin(a ^ b).count("1") for a, b in zip(fps[i], fps[j])
            )
            if ham <= t:
                want[(i, j)] = ham
    assert got == want
