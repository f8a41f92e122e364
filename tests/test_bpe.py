"""BPE training loop: Spark implementation vs a pure-Python reference
model, plus the encode (serving) half."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from spotify_streaming_etl_pipeline_spark.llm.bpe import (
    apply_merge,
    bpe_train,
    encode_with_merges,
)


def _py_bpe(texts: list[str], n_merges: int) -> list[tuple[int, str, str, str, int]]:
    """Reference Sennrich-style BPE on a word-frequency table with
    greedy leftmost-first merge application and (count desc, pair asc)
    tie-breaks — the model bpe_train must reproduce."""
    freq = Counter(w for t in texts for w in t.split(" ") if w)
    vocab = {w: [list(w), c] for w, c in freq.items()}
    out = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.values():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (l, r), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((rank, l, r, l + r, n))
        for entry in vocab.values():
            syms = entry[0]
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    merged.append(l + r)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            entry[0] = merged
    return out


TEXTS = [
    "the cat sat on the mat",
    "the bat and the rat chat",
    "aaaa aaa aa banana bandana",
    "low lower lowest slow slower",
    "ababab abab ab",
]


def test_bpe_train_matches_python_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["merged"],
         r["pair_count"])
        for r in bpe_train(docs, n_merges=8).orderBy("merge_rank").collect()
    ]
    assert got == _py_bpe(TEXTS, 8)


def test_apply_merge_greedy_nonoverlapping(spark):
    df = spark.createDataFrame([(list("aaaa"),), (list("aab"),)], "s array<string>")
    out = [r["m"] for r in df.select(apply_merge(F.col("s"), "a", "a").alias("m")).collect()]
    assert out == [["aa", "aa"], ["aa", "b"]]


def test_encode_roundtrip_preserves_text(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_train(docs, n_merges=4).orderBy("merge_rank").collect()
    ]
    enc = {
        r["doc_id"]: r["tokens"]
        for r in encode_with_merges(docs, merges).collect()
    }
    for i, t in enumerate(TEXTS):
        # concatenating a doc's tokens reproduces its text minus spaces
        assert "".join(enc[i]) == t.replace(" ", "")
        # at least one multi-char token appears somewhere after 4 merges
    assert any(len(tok) > 1 for toks in enc.values() for tok in toks)


from hypothesis import given, settings, strategies as st

_WORDS = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=6), min_size=1, max_size=12
)


@settings(max_examples=5, deadline=None)
@given(texts=st.lists(_WORDS.map(" ".join), min_size=1, max_size=4),
       n=st.integers(min_value=1, max_value=5))
def test_bpe_train_property_vs_python_model(spark, texts, n):
    """Random tiny-alphabet corpora maximize merge collisions and
    tie-break pressure; the Spark loop must equal the Python model on
    every one of them."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["merged"],
         r["pair_count"])
        for r in bpe_train(docs, n_merges=n).orderBy("merge_rank").collect()
    ]
    assert got == _py_bpe(texts, n)


def _py_encode(texts, merges):
    out = {}
    for i, t in enumerate(texts):
        toks = []
        for w in t.split(" "):
            if not w:
                continue
            syms = list(w)
            for l, r in merges:
                merged, j = [], 0
                while j < len(syms):
                    if j + 1 < len(syms) and syms[j] == l and syms[j + 1] == r:
                        merged.append(l + r)
                        j += 2
                    else:
                        merged.append(syms[j])
                        j += 1
                syms = merged
            toks.extend(syms)
        out[i] = toks
    return out


@settings(max_examples=5, deadline=None)
@given(texts=st.lists(_WORDS.map(" ".join), min_size=1, max_size=3),
       n=st.integers(min_value=1, max_value=4))
def test_encode_with_merges_matches_python_model(spark, texts, n):
    """The serving half must apply learned merges rank-by-rank exactly
    as the reference Python encoder does — token identity AND order."""
    texts = [t for t in texts if t.strip()] or ["ab"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = [(m[1], m[2]) for m in _py_bpe(texts, n)]
    got = {
        r["doc_id"]: list(r["tokens"])
        for r in encode_with_merges(docs, merges).collect()
    }
    want = {i: toks for i, toks in _py_encode(texts, merges).items() if toks}
    assert got == want
