"""Property-based pins for the semantics-drift risks SURVEY §7 lists:
Postgres truncating division, Python vs Spark rounding, release-date
normalization, smart keys, timezone round-trips, portable hashing.

Each property evaluates a hypothesis-generated BATCH through one Spark
job and compares against an independent Python model of the
reference's behavior (reference scripts/etl/transformer.py)."""

from __future__ import annotations

import datetime as dt
import hashlib

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from spotify_streaming_etl_pipeline_spark.functions.scalar import (
    date_id,
    from_utc,
    minute_of_day,
    ms_to_sec_round,
    ms_to_sec_trunc,
    normalize_release_date,
    safe_percent,
    to_utc,
)
from spotify_streaming_etl_pipeline_spark.llm.text import portable_hash48

PROPS = settings(max_examples=5, deadline=None)


@PROPS
@given(st.lists(st.integers(min_value=0, max_value=10**10), min_size=1, max_size=100))
def test_ms_trunc_is_postgres_integer_division(spark, ms_values):
    df = spark.createDataFrame([(v,) for v in ms_values], "ms: long")
    got = [r["s"] for r in df.select(ms_to_sec_trunc("ms").alias("s")).collect()]
    assert got == [v // 1000 for v in ms_values]


@PROPS
@given(st.lists(st.integers(min_value=0, max_value=10**10), min_size=1, max_size=100))
def test_ms_round_half_up_with_documented_python_drift(spark, ms_values):
    """Spark round is HALF_UP; Python round is HALF_EVEN. They agree
    everywhere except ms % 1000 == 500 with an even quotient — the
    drift scalar.py documents."""
    df = spark.createDataFrame([(v,) for v in ms_values], "ms: long")
    got = {v: r["s"] for v, r in zip(
        ms_values, df.select(ms_to_sec_round("ms").alias("s")).collect()
    )}
    for v in ms_values:
        if v % 1000 == 500:
            assert got[v] == v // 1000 + 1  # half-up always rounds away
        else:
            assert got[v] == int(round(v / 1000))


@PROPS
@given(st.lists(
    st.dates(min_value=dt.date(1990, 1, 1), max_value=dt.date(2035, 12, 31)),
    min_size=1, max_size=100,
))
def test_smart_date_key_roundtrip(spark, dates):
    df = spark.createDataFrame([(d,) for d in dates], "d: date")
    got = [r["k"] for r in df.select(date_id(F.col("d")).alias("k")).collect()]
    assert got == [d.year * 10000 + d.month * 100 + d.day for d in dates]


@PROPS
@given(st.lists(
    st.datetimes(min_value=dt.datetime(2000, 1, 1), max_value=dt.datetime(2030, 1, 1)),
    min_size=1, max_size=50,
))
def test_minute_of_day_key(spark, tss):
    df = spark.createDataFrame([(t,) for t in tss], "t: timestamp")
    got = [r["m"] for r in df.select(minute_of_day(F.col("t")).alias("m")).collect()]
    assert got == [t.hour * 60 + t.minute for t in tss]


@PROPS
@given(st.lists(
    st.datetimes(min_value=dt.datetime(2015, 1, 1), max_value=dt.datetime(2030, 1, 1)),
    min_size=1, max_size=50,
))
def test_msk_roundtrip_identity(spark, tss):
    """UTC -> MSK wall-clock -> UTC must be the identity (Moscow has no
    DST since 2014, the reference's delta-comparison relies on this)."""
    df = spark.createDataFrame([(t,) for t in tss], "t: timestamp")
    out = df.select(
        F.col("t"), to_utc(from_utc(F.col("t"))).alias("rt")
    ).collect()
    for r in out:
        assert r["t"] == r["rt"]
    # and the wall-clock shift is exactly +3h
    shifted = df.select((from_utc(F.col("t"))).alias("m"), "t").collect()
    for r in shifted:
        assert r["m"] - r["t"] == dt.timedelta(hours=3)


def _ref_normalise(raw: str | None, precision: str | None) -> dt.date | None:
    """Python model of reference transformer.py:132-159."""
    if raw is None:
        return None
    if raw.startswith("0000"):
        return dt.date(1900, 1, 1)
    if precision == "year":
        raw = f"{raw}-01-01"
    elif precision == "month":
        raw = f"{raw}-01"
    try:
        return dt.date.fromisoformat(raw)
    except ValueError:
        return None


@PROPS
@given(st.lists(
    st.tuples(
        st.dates(min_value=dt.date(1950, 1, 1), max_value=dt.date(2030, 12, 31)),
        st.sampled_from(["day", "month", "year"]),
        st.booleans(),  # zero-year corruption
    ),
    min_size=1, max_size=50,
))
def test_release_date_normalization_model(spark, cases):
    rows = []
    for d, prec, corrupt in cases:
        if corrupt:
            raw = "0000-00-00"
        elif prec == "day":
            raw = d.isoformat()
        elif prec == "month":
            raw = d.strftime("%Y-%m")
        else:
            raw = d.strftime("%Y")
        rows.append((raw, prec))
    df = spark.createDataFrame(rows, "raw: string, prec: string")
    got = [
        r["n"]
        for r in df.select(
            normalize_release_date(F.col("raw"), F.col("prec")).alias("n")
        ).collect()
    ]
    assert got == [_ref_normalise(raw, prec) for raw, prec in rows]


@PROPS
@given(st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10**6),
        st.integers(min_value=0, max_value=10**4),
    ),
    min_size=1, max_size=100,
))
def test_safe_percent_null_on_zero_denominator(spark, pairs):
    df = spark.createDataFrame(pairs, "n: long, d: long")
    got = df.select(safe_percent(F.col("n"), F.col("d")).alias("p")).collect()
    for (n, d), r in zip(pairs, got):
        if d == 0:
            assert r["p"] is None
        else:
            assert abs(r["p"] - n / d * 100) <= 0.05 + 1e-9


@PROPS
@given(st.lists(
    st.text(alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
            min_size=0, max_size=40),
    min_size=1, max_size=50,
))
def test_portable_hash48_matches_python_md5(spark, strings):
    df = spark.createDataFrame([(s,) for s in strings], "s: string")
    got = [r["h"] for r in df.select(portable_hash48(F.col("s")).alias("h")).collect()]
    want = [int(hashlib.md5(s.encode()).hexdigest()[:12], 16) for s in strings]
    assert got == want


_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "epsilon",
                         "zeta", "eta", "theta"])
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@PROPS
@given(st.lists(_doc, min_size=1, max_size=30))
def test_packing_stream_is_gapless_partition(spark, texts):
    """Concat-and-chunk invariant: doc spans tile [0, total_tokens)
    exactly — no gaps, no overlaps, in any hash order — and chunk ids
    match floor(offset / ctx)."""
    from spotify_streaming_etl_pipeline_spark.llm.packing import pack_concat_chunks

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = pack_concat_chunks(df, ctx_tokens=7).collect()
    spans = sorted((r["start_offset"], r["n_tokens"]) for r in out)
    cursor = 0
    for start, n in spans:
        assert start == cursor
        cursor += n
    assert cursor == sum(len(t.split()) for t in texts if t)
    for r in out:
        assert r["first_chunk"] == r["start_offset"] // 7
        end = r["start_offset"] + max(r["n_tokens"], 1) - 1
        assert r["last_chunk"] == end // 7


@PROPS
@given(st.lists(st.integers(min_value=0, max_value=10**6),
                min_size=1, max_size=60, unique=True))
def test_shard_positions_are_dense_ranks(spark, ids):
    """Every shard's positions must be exactly 1..len(shard): dense,
    gapless, collision-free — the loader contract."""
    from collections import Counter

    from spotify_streaming_etl_pipeline_spark.llm.packing import shard_assignments

    df = spark.createDataFrame([(i,) for i in ids], "doc_id: long")
    out = shard_assignments(df, n_shards=4).collect()
    assert len(out) == len(ids)
    by_shard = Counter(r["shard"] for r in out)
    pos = {}
    for r in out:
        pos.setdefault(r["shard"], []).append(r["pos"])
    for shard, n in by_shard.items():
        assert sorted(pos[shard]) == list(range(1, n + 1))


@PROPS
@given(st.lists(_doc.filter(lambda t: len(t.split()) >= 3),
                min_size=1, max_size=25),
       st.integers(min_value=1, max_value=5))
def test_cap_doc_freq_bounds_posting_df(spark, texts, cap):
    """After cap_doc_freq, no shingle's document frequency exceeds the
    cap — the invariant that bounds the self-join's hottest key."""
    from spotify_streaming_etl_pipeline_spark.llm.dedup import _posting, cap_doc_freq

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    capped = cap_doc_freq(_posting(df, "text"), cap)
    max_df = (
        capped.groupBy("h1").agg(F.count(F.lit(1)).alias("df"))
        .agg(F.max("df")).collect()[0][0]
    )
    assert max_df is None or max_df <= cap


@PROPS
@given(st.lists(_doc.filter(lambda t: len(t.split()) >= 3),
                min_size=2, max_size=20),
       st.integers(min_value=1, max_value=5))
def test_bucket_pair_form_matches_capped_self_join(spark, texts, cap):
    """The join-free posting_buckets/bucket_shared_counts plan must
    emit exactly the pairs of cap_doc_freq + posting self-join — the
    rewrite is a physical-plan change, not a semantic one."""
    from spotify_streaming_etl_pipeline_spark.llm.dedup import (
        _posting, bucket_shared_counts, cap_doc_freq, posting_buckets,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    posting = _posting(df, "text").persist()
    bucketed = sorted(
        map(tuple, bucket_shared_counts(
            posting_buckets(posting, cap)).collect())
    )
    capped = cap_doc_freq(posting, cap)
    a = capped.select(F.col("doc_id").alias("doc_a"), "h1")
    b = capped.select(F.col("doc_id").alias("doc_b"), "h1")
    joined = sorted(
        map(tuple,
            a.join(b, "h1")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .collect())
    )
    posting.unpersist()
    assert bucketed == joined


@PROPS
@given(
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50)),
             min_size=1, max_size=25),
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50)),
             min_size=0, max_size=25),
)
def test_asof_join_matches_brute_force(spark, lefts, rights):
    """asof_join (tagged-union + window carry) vs the quadratic
    reference model: for every left row, the right row with the
    greatest ts <= left ts on the same key (inclusive), else nulls."""
    from spotify_streaming_etl_pipeline_spark.operators.asof import asof_join

    # de-dup right per (key, ts): operator contract requires uniqueness
    rights = list({(k, t): (k, t) for k, t in rights}.values())
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lefts)],
        "k: long, ts: long, lid: long",
    )
    rdf = spark.createDataFrame(
        [(k, t, 100 + i) for i, (k, t) in enumerate(rights)],
        "k: long, ts: long, rid: long",
    ) if rights else spark.createDataFrame([], "k: long, ts: long, rid: long")
    got = {
        r["lid"]: (r["asof_ts"], r["rid"])
        for r in asof_join(ldf, rdf, on=["k"]).collect()
    }
    for i, (k, t) in enumerate(lefts):
        cands = [(rt, 100 + j) for j, (rk, rt) in enumerate(rights)
                 if rk == k and rt <= t]
        expect = max(cands) if cands else (None, None)
        assert got[i] == expect, f"left {i} (k={k}, ts={t})"


@PROPS
@given(
    st.lists(
        st.lists(
            st.text(alphabet="abcdef", min_size=1, max_size=4),
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=2, max_value=20),
    st.integers(min_value=1, max_value=20),
)
def test_chunking_matches_python_model(spark, token_lists, chunk_size, stride):
    """chunk_documents against an independent Python sliding-window
    model, for arbitrary token counts / chunk sizes / strides
    (stride <= chunk_size): same chunk ids, same token slices."""
    from spotify_streaming_etl_pipeline_spark.llm.text import chunk_documents

    stride = min(stride, chunk_size)
    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {
        (r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(df, chunk_size=chunk_size, stride=stride).collect()
    }
    want = {}
    for i, toks in enumerate(token_lists):
        n = len(toks)
        if n == 0:
            continue
        n_chunks = 1 if n <= chunk_size else (n - chunk_size + stride - 1) // stride + 1
        for c in range(n_chunks):
            piece = toks[c * stride : c * stride + chunk_size]
            want[(i, c)] = (len(piece), " ".join(piece))
    assert got == want


@given(
    st.lists(  # base rows: (key, value)
        st.tuples(st.integers(0, 15), st.integers(0, 100)),
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    st.lists(  # change feed: (key, op, seq, value)
        st.tuples(
            st.integers(0, 20),
            st.sampled_from(["I", "U", "D"]),
            st.integers(0, 50),
            st.integers(0, 100),
        ),
        max_size=40,
        unique_by=lambda t: (t[0], t[2]),  # (key, seq) unique = total order
    ),
)
@PROPS
def test_apply_cdc_matches_dict_model(spark, base_rows, change_rows):
    """apply_cdc == replaying the per-key-latest change into a dict."""
    from spotify_streaming_etl_pipeline_spark.operators.cdc import apply_cdc

    model = {k: v for k, v in base_rows}
    latest = {}
    for k, op, seq, v in change_rows:
        if k not in latest or seq > latest[k][1]:
            latest[k] = (op, seq, v)
    for k, (op, _seq, v) in latest.items():
        if op == "D":
            model.pop(k, None)
        else:
            model[k] = v

    base = spark.createDataFrame(
        [(k, float(v)) for k, v in base_rows] or [(None, None)], "k long, v double"
    ).filter("k IS NOT NULL")
    changes = spark.createDataFrame(
        [(k, op, s, float(v)) for k, op, s, v in change_rows]
        or [(None, None, None, None)],
        "k long, op string, seq long, v double",
    ).filter("k IS NOT NULL")
    got = {
        r["k"]: r["v"] for r in apply_cdc(base, changes, ["k"], "seq").collect()
    }
    assert got == {k: float(v) for k, v in model.items()}


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.sampled_from(["a", "b", None])),
        min_size=1,
        max_size=40,
    )
)
@PROPS
def test_scd2_collapse_matches_list_model(spark, rows):
    """scd2_collapse == a per-key linear scan that opens an interval on
    every (null-safe) attribute change."""
    from spotify_streaming_etl_pipeline_spark.operators.scd import scd2_collapse

    import datetime as dt

    feed = [
        (k, dt.datetime(2021, 1, 1) + dt.timedelta(hours=i), a, i)
        for i, (k, a) in enumerate(rows)
    ]
    model = {}
    for k, ts, a, _seq in sorted(feed, key=lambda r: (r[0], r[1], r[3])):
        hist = model.setdefault(k, [])
        if not hist or hist[-1][0] != a:
            hist.append((a, ts))
    expect = []
    for k, hist in model.items():
        for i, (a, ts) in enumerate(hist):
            nxt = hist[i + 1][1] if i + 1 < len(hist) else None
            expect.append((k, a, ts, nxt, nxt is None, i + 1))

    df = spark.createDataFrame(
        feed, "k long, ts timestamp, attr string, seq long"
    )
    key = lambda t: (t[0], t[5])  # (k, version) is a total order  # noqa: E731
    got = sorted(
        (
            (r["k"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"], r["version"])
            for r in scd2_collapse(df, "k", "attr", tiebreak_col="seq").collect()
        ),
        key=key,
    )
    assert got == sorted(expect, key=key)


@PROPS
@given(st.lists(
    st.tuples(st.integers(min_value=0, max_value=30),
              st.integers(min_value=0, max_value=30)),
    min_size=1, max_size=60,
))
def test_dup_clusters_matches_python_union_find(spark, edges):
    """Connected components over arbitrary small pair graphs (self
    loops, parallel edges, arbitrary direction) must equal an
    independent Python union-find with min-id labels — the invariant
    every keeper-selection query builds on."""
    from spotify_streaming_etl_pipeline_spark.llm.dedup import dup_clusters

    pairs = spark.createDataFrame(edges, "doc_a: long, doc_b: long")
    got = {(r["doc_id"], r["cluster_id"]) for r in dup_clusters(pairs).collect()}

    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            lo, hi = min(ru, rv), max(ru, rv)
            parent[hi] = lo
    want = {(n, find(n)) for n in parent}
    assert got == want


@PROPS
@given(st.lists(
    st.lists(st.sampled_from("abcdefg"), min_size=3, max_size=12),
    min_size=2, max_size=12,
))
def test_jaccard_and_containment_match_python_set_model(spark, word_lists):
    """The full inverted-index pipeline (tokenize → shingle → 48-bit
    hash → self-join → counts) must reproduce plain Python set
    arithmetic over word trigrams, for both the symmetric (Jaccard)
    and asymmetric (containment) formulas, on arbitrary tiny corpora
    (48-bit collisions are vanishing at this size)."""
    from spotify_streaming_etl_pipeline_spark.llm.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    texts = [" ".join(ws) for ws in word_lists]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id: long, text: string"
    )

    def shingles(ws):
        return {"|".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

    sets = {i: shingles(ws) for i, ws in enumerate(word_lists)}
    want_j, want_c = {}, {}
    for a in sets:
        for b in sets:
            if a >= b or not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            if not inter:
                continue  # inner join: zero-overlap pairs never appear
            j = round(inter / len(sets[a] | sets[b]), 4)
            c = round(inter / min(len(sets[a]), len(sets[b])), 4)
            if j >= 0.05:
                want_j[(a, b)] = j
            if c >= 0.05:
                want_c[(a, b)] = c

    got_j = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, threshold=0.05).collect()
    }
    got_c = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in containment_pairs(df, threshold=0.05).collect()
    }
    assert got_j == want_j
    assert got_c == want_c


@PROPS
@given(
    st.lists(
        st.integers(min_value=-30000, max_value=30000),
        min_size=1,
        max_size=300,
    ),
    st.sampled_from([None, 0, 1, 2]),
)
def test_flac_roundtrip_is_lossless(spark, sig, order):
    """FLAC encode->decode is the identity for every signal and every
    subset subframe type (constant collapses handled by the encoder,
    verbatim when order is None, fixed 0-2 otherwise) — pure-Python
    property, no Spark job needed."""
    from spotify_streaming_etl_pipeline_spark.llm.flac import (
        decode_flac,
        encode_flac,
    )

    dec = decode_flac(encode_flac([sig], fixed_order=order))
    assert dec["samples"] == sig
    assert dec["n_samples"] == len(sig)


@PROPS
@given(
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=1, max_value=3),
    st.lists(st.integers(min_value=0, max_value=255), min_size=12, max_size=12),
)
def test_jpeg_solid_blocks_roundtrip_exactly(spark, wb, hb, vals):
    """Solid 8x8 blocks under the flat-8 quant table survive the full
    JPEG entropy pipeline bit-exactly, for every grid shape."""
    from spotify_streaming_etl_pipeline_spark.llm.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    img = [
        [vals[(y // 8) * wb + (x // 8)] for x in range(8 * wb)]
        for y in range(8 * hb)
    ]
    out = decode_jpeg(encode_jpeg([img]))
    assert (out["width"], out["height"]) == (8 * wb, 8 * hb)
    assert out["pixels"] == [v for row in img for v in row]


_URL_CHARS = st.text(
    alphabet="abcXYZ019-._~", min_size=1, max_size=8
)


@PROPS
@given(
    st.sampled_from(["http", "https", "HTTPS"]),
    _URL_CHARS,
    st.sampled_from(["", ":443", ":80", ":8080"]),
    st.lists(_URL_CHARS, min_size=0, max_size=3),
    st.sampled_from(["", "?x=1", "?utm_source=a&x=1", "?gclid=z"]),
    st.sampled_from(["", "#frag"]),
)
def test_canonical_url_is_idempotent(spark, scheme, host, port, segs, q, frag):
    """canonical_url(canonical_url(u)) == canonical_url(u) for every
    generated URL — the law that makes it safe to store canonical
    forms and re-canonicalize mixed corpora."""
    from spotify_streaming_etl_pipeline_spark.llm.text import canonical_url

    url = f"{scheme}://{host}{port}/" + "/".join(segs) + q + frag
    df = spark.createDataFrame([(url,)], "url: string")
    once = df.select(canonical_url(F.col("url")).alias("c"))
    row = once.select(
        "c", canonical_url(F.col("c")).alias("c2")
    ).first()
    assert row["c2"] == row["c"]


@PROPS
@given(st.lists(
    st.lists(st.sampled_from(["a", "bb", "ccc", "dd"]), min_size=0, max_size=12),
    min_size=1, max_size=8,
))
def test_repetition_table_matches_python_model(spark, word_lists):
    """repetition_table's occurrence counting, (count desc, gram asc)
    tie break, and full-occurrence char accounting vs an independent
    Counter model over hypothesis word streams (tiny vocab forces
    heavy repetition and ties). The model replicates Spark's round
    semantics exactly — HALF_UP over the shortest decimal string
    (java BigDecimal.valueOf), NOT Python's HALF_EVEN over the binary
    value: they disagree on representable ties like 5/32 at 4dp."""
    import decimal
    from collections import Counter

    from spotify_streaming_etl_pipeline_spark.llm.text import repetition_table

    def spark_round4(x: float) -> float:
        return float(
            decimal.Decimal(repr(x)).quantize(
                decimal.Decimal("0.0001"), rounding=decimal.ROUND_HALF_UP
            )
        )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(word_lists)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {r["doc_id"]: r for r in repetition_table(df).collect()}

    for i, ws in enumerate(word_lists):
        if len(ws) < 2:
            assert i not in got
            continue
        nc = len(" ".join(ws))
        two = Counter(" ".join(ws[j : j + 2]) for j in range(len(ws) - 1))
        top_gram = min(two, key=lambda g: (-two[g], g))
        three = Counter(" ".join(ws[j : j + 3]) for j in range(len(ws) - 2))
        dup_chars = sum(c * len(g) for g, c in three.items() if c >= 2)
        r = got[i]
        assert r["top2_gram"] == top_gram
        assert r["top2_count"] == two[top_gram]
        assert r["top2_char_frac"] == spark_round4(two[top_gram] * len(top_gram) / nc)
        assert r["dup3_char_frac"] == spark_round4(dup_chars / nc)
