"""End-to-end corpus build (llm/corpus.py): archive bytes in,
deduped + quality-filtered + leakage-safely-split corpus out."""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_streaming_etl_pipeline_spark.llm.corpus import build_training_corpus
from spotify_streaming_etl_pipeline_spark.llm.warc import build_warc

LONG_A = (
    "the quick brown fox jumps over the lazy dog while seventeen sleepy"
    " cats watch quietly from the old wooden fence near the river bank"
)
LONG_B = (
    "completely different words appear in this sentence because the"
    " narrator switched topics to submarine maintenance schedules and"
    " galley inventory rotations for the long voyage south"
)


def _page(url, text):
    body = f"<html><body><p>{text}</p></body></html>".encode()
    return (url, 200, "text/html", body)


def test_build_training_corpus_end_to_end(spark):
    recs = {
        # blob 0: a good page, a verbatim mirror of it at another URL
        # (exact dedup), and the SAME canonical URL twice (url dedup)
        0: [
            _page("http://a.example.com/x?utm_source=t", LONG_A),
            _page("http://mirror.example.com/x", LONG_A),
            _page("http://a.example.com/x", LONG_A),
        ],
        # blob 1: a near-dup of the good page (one word changed) and a
        # distinct good page
        1: [
            _page("http://b.example.com/y", LONG_A.replace("dog", "hen")),
            _page("http://c.example.com/z", LONG_B),
        ],
        # blob 2: junk (symbol soup -> low quality score) and a 404
        2: [
            _page("http://d.example.com/junk", "@#$% ^&*() {}[] <><> ~~!!"),
            ("http://e.example.com/gone", 404, "text/plain", b"not found"),
        ],
    }
    blobs = spark.createDataFrame(
        [(i, bytearray(build_warc(r, member_gzip=i % 2 == 0)))
         for i, r in recs.items()],
        "doc_id long, blob binary",
    )
    out = build_training_corpus(
        blobs, jaccard_threshold=0.5, quality_quantile=0.4
    )
    rows = {r["url"]: r for r in out.collect()}
    # survivors: ONE copy of LONG_A (min page id = blob0/rec0, its
    # canonical URL with the tracking param stripped) and LONG_B; the
    # mirror, the url-dup, the near-dup, the junk, and the 404 are gone
    assert set(rows) == {"http://a.example.com/x", "http://c.example.com/z"}
    a = rows["http://a.example.com/x"]
    assert a["doc_id"] == 0  # blob 0 * 4 + rec 0
    assert a["lang"] == "en"
    assert a["quality_score"] is not None
    assert {r["split"] for r in rows.values()} <= {"train", "val", "test"}
    # deterministic rebuild
    again = {r["url"]: r for r in build_training_corpus(
        blobs, jaccard_threshold=0.5, quality_quantile=0.4
    ).collect()}
    assert {u: (r["doc_id"], r["split"]) for u, r in rows.items()} == {
        u: (r["doc_id"], r["split"]) for u, r in again.items()
    }


def test_build_training_corpus_split_follows_cluster(spark):
    """A kept page's split bucket must be keyed on its near-dup
    CLUSTER id (the min page id of the group), not its own id — the
    leakage guard property, asserted against dataset_split on the
    group key directly."""
    from spotify_streaming_etl_pipeline_spark.llm.curation import dataset_split

    recs = {
        7: [_page("http://a.example.com/1", LONG_A)],
        9: [_page("http://b.example.com/2", LONG_A.replace("dog", "hen"))],
    }
    blobs = spark.createDataFrame(
        [(i, bytearray(build_warc(r, member_gzip=False)))
         for i, r in recs.items()],
        "doc_id long, blob binary",
    )
    out = build_training_corpus(
        blobs, jaccard_threshold=0.5, quality_quantile=0.0
    ).collect()
    # near-dups: only the min page id (7*4=28) survives, and its split
    # is the one its GROUP id (28) hashes to
    assert [r["doc_id"] for r in out] == [28]
    want = dataset_split(
        spark.createDataFrame([(28,)], "doc_id long")
    ).collect()[0]["split"]
    assert out[0]["split"] == want


def test_build_training_corpus_optional_stages(spark):
    """robots gate, line-level boilerplate dedup, and bloom
    decontamination, each doing provable work in one chain."""
    from spotify_streaming_etl_pipeline_spark.llm.robots import parse_robots

    footer = "subscribe to our newsletter for weekly updates and offers"
    BENCH_C = (
        "the held out evaluation passage speaks of ancient lighthouses"
        " guiding weary sailors past treacherous basalt reefs at midnight"
    )
    recs = {
        # two good pages sharing a boilerplate footer paragraph —
        # line dedup must strip the SECOND copy only
        0: [_page("http://a.example.com/x", f"{LONG_A}</p><p>{footer}")],
        1: [_page("http://c.example.com/z", f"{LONG_B}</p><p>{footer}")],
        # a page under a disallowed path — robots gate drops it
        2: [_page("http://a.example.com/private/s", LONG_B.replace("submarine", "zeppelin"))],
        # a page that verbatim-contains the benchmark passage — bloom
        # decontamination drops it
        3: [_page("http://d.example.com/leak",
                  "intro words first then " + BENCH_C + " closing words after")],
    }
    blobs = spark.createDataFrame(
        [(i, bytearray(build_warc(r, member_gzip=False))) for i, r in recs.items()],
        "doc_id long, blob binary",
    )
    robots = parse_robots(
        spark.createDataFrame(
            [("a.example.com", "User-agent: *\nDisallow: /private/\n")],
            "host string, robots_txt string",
        )
    )
    bench = spark.createDataFrame([(1, BENCH_C)], "doc_id long, text string")
    out = build_training_corpus(
        blobs,
        jaccard_threshold=0.9,
        quality_quantile=0.0,
        robots_rules=robots,
        line_dedup_boilerplate=True,
        benchmark=bench,
        bloom_m_bits=1 << 20,
        bloom_k=4,
        bloom_flag_ratio=0.4,
    )
    rows = {r["url"]: r for r in out.collect()}
    # the private page and the contaminated page are gone
    assert set(rows) == {"http://a.example.com/x", "http://c.example.com/z"}
    # the footer survives exactly once, on the smaller page id
    assert footer in rows["http://a.example.com/x"]["text"]
    assert footer not in rows["http://c.example.com/z"]["text"]
    assert LONG_B.split()[0] in rows["http://c.example.com/z"]["text"]
    # folded back to the single-space contract
    assert "\n" not in rows["http://a.example.com/x"]["text"]


def test_build_training_corpus_pdf_route(spark):
    """include_pdfs unions the archives' 200/application-pdf records
    into the corpus as extracted-text pages: raw-byte parsing (lossy
    string bodies would corrupt the compressed streams), form-feeds
    folded to the single-space contract, and exactly one PDF page per
    archive doc; the default leaves PDFs out."""
    from spotify_streaming_etl_pipeline_spark.llm.warc import (
        synth_mixed_warc_blob,
    )

    rows = [(i, bytearray(synth_mixed_warc_blob(i))) for i in range(12)]
    blobs = spark.createDataFrame(rows, "doc_id long, blob binary")
    out = build_training_corpus(
        blobs, include_pdfs=True, quality_quantile=0.0
    ).collect()
    pdfs = {r.doc_id: r for r in out if "/d/" in r.url}
    htmls = [r for r in out if "/p/" in r.url]
    assert len(pdfs) == 12 and len(htmls) == 12
    # doc 8: compressed streams, 1 page, arithmetic text, folded flat
    r8 = pdfs[8 * 4 + 1]
    assert r8.text == "[00008:0:0] pdf24. [00008:0:1] pdf25."
    assert "\n" not in r8.text and "\f" not in r8.text
    # default: no PDF pages
    plain = build_training_corpus(blobs, quality_quantile=0.0).collect()
    assert all("/p/" in r.url for r in plain)


def test_build_training_corpus_verbatim_span_removal(spark):
    """verbatim_min_len wires the Lee et al. 2022 surgical stage into
    the one-call builder: two pages that are NOT near-dups but share a
    long verbatim passage both survive, the KEEPER (min page id) keeps
    its full text, the other loses exactly the shared span, and a page
    that is nothing but the shared passage is emptied and dropped."""
    shared = (
        "THE0SHARED1PASSAGE2REPEATS3VERBATIM4ACROSS5PAGES6AND7MUST8BE9"
        "CUT0OUT1SURGICALLY2BY3THE4SPAN5STAGE"
    )
    x_text = (
        "alpha paragraphs about riverside botany fill this page with"
        " plenty of its own words a" + shared + "b and then botany"
        " continues with seed catalogs and irrigation notes"
    )
    y_text = (
        "nine submarine maintenance chapters begin here covering galley"
        " inventory and ballast procedure 9" + shared + "7 followed by"
        " torpedo room checklists and sonar calibration logs"
    )
    recs = {
        0: [_page("http://x.example.com/keeper", x_text)],
        1: [_page("http://y.example.com/charged", y_text)],
        2: [_page("http://z.example.com/onlyspan", shared)],
    }
    blobs = spark.createDataFrame(
        [
            (i, bytearray(build_warc(r, member_gzip=False)))
            for i, r in recs.items()
        ],
        "doc_id long, blob binary",
    )
    out = {
        r["url"]: r
        for r in build_training_corpus(
            blobs,
            jaccard_threshold=0.9,
            quality_quantile=0.0,
            verbatim_min_len=30,
        ).collect()
    }
    assert set(out) == {
        "http://x.example.com/keeper",
        "http://y.example.com/charged",
    }
    assert shared in out["http://x.example.com/keeper"]["text"]
    assert out["http://y.example.com/charged"]["text"] == y_text.replace(
        shared, ""
    )
    # without the stage, all three pages survive intact
    plain = build_training_corpus(
        blobs, jaccard_threshold=0.9, quality_quantile=0.0
    )
    assert plain.count() == 3


def test_build_training_corpus_occurrence_mode(spark):
    """verbatim_mode='occurrence' swaps the pairwise span enumeration
    for the linear occurrence form — same surgical outcome on a
    two-page shared passage, and the page that is nothing but the
    passage still drops."""
    shared = (
        "THE0SHARED1PASSAGE2REPEATS3VERBATIM4ACROSS5PAGES6AND7MUST8BE9"
        "CUT0OUT1SURGICALLY2BY3THE4SPAN5STAGE"
    )
    x_text = (
        "alpha paragraphs about riverside botany fill this page with"
        " plenty of its own words a" + shared + "b and then botany"
        " continues with seed catalogs and irrigation notes"
    )
    y_text = (
        "nine submarine maintenance chapters begin here covering galley"
        " inventory and ballast procedure 9" + shared + "7 followed by"
        " torpedo room checklists and sonar calibration logs"
    )
    recs = {
        0: [_page("http://x.example.com/keeper", x_text)],
        1: [_page("http://y.example.com/charged", y_text)],
        2: [_page("http://z.example.com/onlyspan", shared)],
    }
    blobs = spark.createDataFrame(
        [
            (i, bytearray(build_warc(r, member_gzip=False)))
            for i, r in recs.items()
        ],
        "doc_id long, blob binary",
    )
    out = {
        r["url"]: r
        for r in build_training_corpus(
            blobs,
            jaccard_threshold=0.9,
            quality_quantile=0.0,
            verbatim_min_len=30,
            verbatim_mode="occurrence",
        ).collect()
    }
    assert set(out) == {
        "http://x.example.com/keeper",
        "http://y.example.com/charged",
    }
    assert shared in out["http://x.example.com/keeper"]["text"]
    assert shared not in out["http://y.example.com/charged"]["text"]
