"""Units for exact verbatim duplicate-span extraction
(llm/overlap.py: duplicate_spans / removal_intervals) — the
Lee et al. 2022 surgical-removal primitive: offsets, maximality,
min_len thresholding, the periodic-text caveat, interval union, and
the candidate funnel."""

from __future__ import annotations

from spotify_streaming_etl_pipeline_spark.llm.overlap import (
    duplicate_spans,
    removal_intervals,
)

S45 = "The quick brown fox jumps over the lazy dog!!"  # 45 chars


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_single_span_offsets_and_length(spark):
    assert len(S45) == 45
    a = "qwertyuiopasdfgh" + S45 + "zxcvbnmmnbvcxzas"
    b = "0a1b2c3d4e5f6g7h8i9j" + S45
    spans = duplicate_spans(_df(spark, [(1, a), (2, b)])).collect()
    assert [(s.doc_a, s.doc_b, s.a_start, s.b_start, s.span_len)
            for s in spans] == [(1, 2, 17, 21, 45)]


def test_two_spans_and_min_len_threshold(spark):
    short = "ABCDEFGHIJKLMNOP"  # exactly 16 shared chars
    assert len(short) == 16
    a = S45 + "qwertyuiopasdfgh" + short + "zxcvbnmmnbvcxzas" + S45.upper()
    b = "0a1b2c3d4e5f6g7h" + S45 + "8i9jKLmnOPqrSTuv" + short + S45.upper()
    df = _df(spark, [(3, a), (7, b)])
    got = {
        (s.a_start, s.b_start, s.span_len)
        for s in duplicate_spans(df, min_len=20).collect()
    }
    # the 16-char block is below min_len; the two 45-char spans keep
    assert got == {(1, 17, 45), (94, 94, 45)}
    with_short = {
        (s.a_start, s.b_start, s.span_len)
        for s in duplicate_spans(df, min_len=16).collect()
    }
    assert with_short == got | {(62, 78, 16)}


def test_periodic_text_subspans_union_in_removal(spark):
    # self-periodic shared text matches on shifted diagonals too —
    # sub-spans are reported, but interval union collapses them
    per = "ab" * 11  # 22 chars, period 2
    a = "qwertyuiopasdfgh" + per + "zxcvnmmlkjhgfdsq"
    b = "0a1b2c3d4e5f6g7j" + per  # filler last char differs from a's
    spans = duplicate_spans(_df(spark, [(1, a), (2, b)]), min_len=20)
    rows = spans.collect()
    lens = sorted(s.span_len for s in rows)
    assert 22 in lens and all(l >= 20 for l in lens)
    iv = removal_intervals(spans).collect()
    assert [(r.doc_id, r.start, r.length) for r in iv] == [(2, 17, 22)]


def test_removal_charges_larger_doc_and_merges_overlaps(spark):
    # doc 9 shares S45 with BOTH 1 and 2 -> identical intervals merge;
    # docs 1 and 2 (keepers in their pairs with 9) are never charged
    a = "qwertyuiopasdfgh" + S45
    b = "0a1b2c3d4e5f6g7j" + S45
    c = "zxcvbnmasdfghjkq" + S45
    spans = duplicate_spans(_df(spark, [(1, a), (2, b), (9, c)]))
    iv = removal_intervals(spans).collect()
    assert {(r.doc_id, r.start, r.length) for r in iv} == {
        (2, 17, 45),
        (9, 17, 45),
    }


def test_candidates_funnel_restricts_docs(spark):
    a = "qwertyuiopasdfgh" + S45
    b = "0a1b2c3d4e5f6g7j" + S45
    c = "zxcvbnmasdfghjkq" + S45
    df = _df(spark, [(1, a), (2, b), (9, c)])
    cand = spark.createDataFrame([(1, 9)], "doc_a long, doc_b long")
    got = {
        (s.doc_a, s.doc_b)
        for s in duplicate_spans(df, candidates=cand).collect()
    }
    assert got == {(1, 9)}


def test_apply_removal_rebuilds_clean_text(spark):
    from spotify_streaming_etl_pipeline_spark.llm.overlap import (
        apply_removal,
    )

    df = _df(spark, [(1, "abcdefghij"), (2, "0123456789"), (3, "keepme")])
    iv = spark.createDataFrame(
        [(1, 3, 2), (1, 7, 2), (2, 9, 5)],  # doc 2's interval overruns
        "doc_id long, start long, length long",
    )
    out = {r.doc_id: r for r in apply_removal(df, iv).collect()}
    assert (out[1].clean_text, out[1].n_removed) == ("abefij", 4)
    assert (out[2].clean_text, out[2].n_removed) == ("01234567", 2)
    # uncharged docs pass through untouched
    assert (out[3].clean_text, out[3].n_removed) == ("keepme", 0)


def test_end_to_end_surgical_dedup(spark):
    from spotify_streaming_etl_pipeline_spark.llm.overlap import (
        apply_removal,
    )

    a = "qwertyuiopasdfgh" + S45 + "zxcvbnmmnbvcxzas"
    b = "0a1b2c3d4e5f6g7j" + S45
    df = _df(spark, [(1, a), (2, b)])
    iv = removal_intervals(duplicate_spans(df))
    out = {r.doc_id: r for r in apply_removal(df, iv).collect()}
    assert out[1].clean_text == a          # keeper untouched
    assert out[2].clean_text == "0a1b2c3d4e5f6g7j"
    assert out[2].n_removed == 45


def test_hot_posting_guard_drops_boilerplate(spark):
    # a window present in > max_postings docs is dropped whole
    rows = [(i, "qwertyuiopasdfgh" + S45) for i in range(1, 6)]
    df = _df(spark, rows)
    assert duplicate_spans(df, max_postings=4).count() == 0
    assert duplicate_spans(df, max_postings=None).count() == 10


def test_occurrence_removal_linear_form(spark):
    """occurrence_removal_intervals: Lee et al.'s 'keep ONE occurrence
    of every duplicated substring' in linear occurrence space — the
    min-(doc_id, position) occurrence is canonical, everything else is
    charged; per-doc islands are exact passage intervals."""
    from spotify_streaming_etl_pipeline_spark.llm.overlap import (
        apply_removal,
        occurrence_removal_intervals,
    )

    shared = "SHARED0PASSAGE1EXACTLY2THIRTYSIX3CHAR"  # 37 chars
    rows = [
        (1, "aaaa bbbb cccc dddd " + shared + " tail one xx"),
        (2, "<<totally different lead-in 22>>" + shared + "|end two|"),
        (3, "=third document prefix 333=" + shared + "~fin~"),
        (4, "no duplicated text here at all, just filler words ok"),
    ]
    iv = {
        (r["doc_id"], r["start"], r["length"])
        for r in occurrence_removal_intervals(
            _df(spark, rows), min_len=20
        ).collect()
    }
    # doc 1 (min id) keeps the canonical occurrence; docs 2 and 3 are
    # charged exactly the passage; doc 4 untouched
    assert iv == {
        (2, 33, len(shared)),
        (3, 28, len(shared)),
    }
    # composed with apply_removal the passage is cut exactly
    out = {
        r["doc_id"]: r
        for r in apply_removal(
            _df(spark, rows),
            occurrence_removal_intervals(_df(spark, rows), min_len=20),
        ).collect()
    }
    assert shared in out[1]["clean_text"]
    assert out[2]["clean_text"] == "<<totally different lead-in 22>>|end two|"
    assert out[3]["clean_text"] == "=third document prefix 333=~fin~"
    assert out[4]["n_removed"] == 0


def test_occurrence_removal_self_repetition_and_guard(spark):
    """Within-document repetitions charge all but the FIRST occurrence
    (the paper's self-duplicate semantics); min_len filters short
    islands; the hot-hash count guard drops corpus-boilerplate windows
    before any work."""
    from spotify_streaming_etl_pipeline_spark.llm.overlap import (
        occurrence_removal_intervals,
    )

    block = "REPEATED4BLOCK5OF6EXACT7CHARS8"  # 30 chars
    # distinct chars right before each occurrence ("]" vs "}") keep
    # the maximal duplicated span to exactly the block
    rows = [(7, "lead-in text aa]" + block + "[middle pad bb}" + block)]
    iv = occurrence_removal_intervals(_df(spark, rows), min_len=20).collect()
    assert len(iv) == 1
    r = iv[0]
    assert (r["doc_id"], r["start"], r["length"]) == (
        7, 16 + len(block) + 15 + 1, len(block)
    )
    # min_len drops it
    assert (
        occurrence_removal_intervals(
            _df(spark, rows), min_len=40
        ).count() == 0
    )
    # boilerplate shared by > max_postings docs is dropped pre-fold
    many = [(i, "qwertyuiopasdfgh" + S45) for i in range(1, 6)]
    assert (
        occurrence_removal_intervals(
            _df(spark, many), min_len=20, max_postings=4
        ).count() == 0
    )
    assert (
        occurrence_removal_intervals(
            _df(spark, many), min_len=20, max_postings=None
        ).count() == 4  # every non-min doc charged its whole text
    )


def test_default_cap_bounds_mid_frequency_pair_work(spark):
    """r12: the DEFAULT max_postings is 100 — sum(n^2) matched-pair
    output is bounded at 100 x postings (linear in corpus).  A passage
    shared by 120 docs (the mid-frequency shape that measured 2.4e9
    pairs / an 8 GB OOM at 10x under the old default of 1000) is
    treated as boilerplate by the bare call; raising the cap
    explicitly opts back into the g^2 pair rows."""
    rows = [
        (i, "%016d" % i + S45 + "%016d" % (i * 7 + 1))
        for i in range(1, 121)
    ]
    df = _df(spark, rows)
    assert duplicate_spans(df).count() == 0
    assert duplicate_spans(df, max_postings=200).count() == 120 * 119 // 2
