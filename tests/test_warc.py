"""WARC ingestion units: spec round-trips (plain + Common Crawl
member-gzip), poison tolerance, and full oracle parity on the real
documents substrate."""

from __future__ import annotations

from pyspark.sql import functions as F

from spotify_streaming_etl_pipeline_spark.llm.warc import (
    attach_warc_blob,
    build_warc,
    parse_warc,
    synth_warc_blob,
    warc_record_table,
)

RECORDS = [
    ("http://a.example.com/x", 200, "text/html", b"<html><body>hi</body></html>"),
    ("http://b.example.com/y?q=1", 404, "text/plain", b"not found"),
    ("http://c.example.com/z", 200, "application/json", b'{"k": [1, 2]}'),
]


def test_warc_roundtrip_plain_and_member_gzip():
    for gz in (False, True):
        got = parse_warc(build_warc(RECORDS, member_gzip=gz))
        assert [
            (r["url"], r["status"], r["content_type"],
             r["n_body_bytes"], r["body"])
            for r in got
        ] == [(u, s, c, len(b), b.decode()) for u, s, c, b in RECORDS]


def test_warc_truncated_blob_parses_clean_prefix():
    blob = build_warc(RECORDS, member_gzip=False)
    second = blob.index(b"WARC/1.0", 1)
    cut = parse_warc(blob[: second + 40])  # mid-second-record
    assert [r["url"] for r in cut] == [RECORDS[0][0]]
    assert parse_warc(b"HTTP nonsense \x00\x01") == []
    assert parse_warc(b"") == []


def test_warc_truncated_gzip_member_is_poison_safe():
    blob = build_warc(RECORDS, member_gzip=True)
    cut = parse_warc(blob[: len(blob) - 7])  # truncate the final member
    assert [r["url"] for r in cut] == [r[0] for r in RECORDS[:2]]


def test_warc_corrupt_gzip_member_is_poison_safe():
    """A bad-CRC (non-truncated) member must not raise: records from
    members already inflated are returned, the corrupt tail dropped."""
    import gzip

    good = gzip.compress(
        build_warc(RECORDS[:1], member_gzip=False), 9, mtime=0
    )
    bad = bytearray(gzip.compress(b"x" * 64, 9, mtime=0))
    bad[-2] ^= 0xFF  # corrupt the CRC trailer
    cut = parse_warc(bytes(good) + bytes(bad))
    assert [r["url"] for r in cut] == [RECORDS[0][0]]


def test_warc_non_utf8_header_is_poison_safe():
    """A latin-1 WARC-Target-URI (real Common Crawl carries these)
    must parse with replacement, not raise inside the task."""
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nok"
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://ex.com/caf\xe9\r\n"
        b"Content-Type: application/http;msgtype=response\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
        + http + b"\r\n\r\n"
    )
    got = parse_warc(rec)
    assert len(got) == 1 and got[0]["status"] == 200
    assert got[0]["url"].startswith("http://ex.com/caf")


def test_synth_warc_blob_matches_its_contract():
    recs = parse_warc(synth_warc_blob(12, "hello world"))
    assert len(recs) == 1 + 12 % 3
    assert recs[0]["url"] == "http://h5.example.com/p/12/0?utm_source=x"
    # (12 + 3) % 5 == 0 -> rec 3 would 404, but only rec 0 exists here;
    # doc 4 rec 1: (4 + 1) % 5 == 0 -> 404
    r4 = parse_warc(synth_warc_blob(4, "t"))
    assert [r["status"] for r in r4] == [200, 404]
    assert r4[1]["n_body_bytes"] == 9


def test_warc_record_table_matches_oracle(spark, sf_dir):
    """End-to-end: synthesize genuine archives, parse them for real
    through the Arrow-batched reader, and hash-compare the full record
    table against DuckDB's arithmetic prediction (r9 registration
    candidate; see plans/llm_media_gates.py:_warc_oracle_sql)."""
    from spotify_streaming_etl_pipeline_spark.plans.llm_media_gates import (
        _warc_oracle_sql,
    )
    from spotify_streaming_etl_pipeline_spark.plans.llm_shared import _docs
    from tests.oracle_utils import compare, duckdb_con

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    got = warc_record_table(attach_warc_blob(d))
    want = duckdb_con(sf_dir).execute(_warc_oracle_sql()).fetchdf()
    assert not compare(got, want)


def test_crawl_corpus_matches_oracle(spark, sf_dir):
    """The whole crawl first mile under one hash: archive bytes ->
    record table -> 200/text-html filter -> canonical URL +
    HTML-to-text + language ID, compared against DuckDB's
    direct-construction prediction (r9 registration candidate)."""
    from spotify_streaming_etl_pipeline_spark.llm.warc import crawl_corpus
    from spotify_streaming_etl_pipeline_spark.plans.llm_media_gates import (
        _crawl_corpus_oracle_sql,
    )
    from spotify_streaming_etl_pipeline_spark.plans.llm_shared import _docs
    from tests.oracle_utils import compare, duckdb_con

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    got = crawl_corpus(attach_warc_blob(d))
    want = duckdb_con(sf_dir).execute(_crawl_corpus_oracle_sql()).fetchdf()
    assert not compare(got, want)


def test_extract_links_and_outlink_edges(spark):
    """href extraction handles both quote styles, uppercase HREF,
    whitespace around =, and unquoted values (all common in real
    crawled HTML) and ignores non-href attributes; edges come out
    canonicalized."""
    from spotify_streaming_etl_pipeline_spark.llm.warc import outlink_edges

    rows = [
        (
            "http://A.example.com/p/?utm_source=x",
            '<a href="http://b.example.com/x?gclid=1">b</a>'
            "<a href='http://c.example.com/y'>c</a>"
            '<img src="http://not-a-link.example.com/z">',
        ),
        ("http://d.example.com/", "<p>no links here</p>"),
        (
            "http://e.example.com/",
            '<A HREF="http://f.example.com/u">f</A>'
            "<a href = 'http://g.example.com/v'>g</a>"
            "<a href=http://h.example.com/w>h</a>",
        ),
    ]
    pages = spark.createDataFrame(rows, "url: string, body: string")
    got = sorted((r["src"], r["dst"]) for r in outlink_edges(pages).collect())
    assert got == [
        ("http://a.example.com/p", "http://b.example.com/x"),
        ("http://a.example.com/p", "http://c.example.com/y"),
        ("http://e.example.com", "http://f.example.com/u"),
        ("http://e.example.com", "http://g.example.com/v"),
        ("http://e.example.com", "http://h.example.com/w"),
    ]


def test_web_pagerank_from_archive_bytes(spark):
    """The full web-graph composition, bytes to ranks: WARC blobs
    whose pages hyperlink a known shape -> record table -> canonical
    outlink edges -> the SAME integer pagerank core the co-purchase
    family certifies. The graph honors the core's documented contract
    (plans/quality.py:pagerank_integer — every node keeps receiving
    contributions, as symmetric edge sets do): hub page a holds three
    in-links, every other page one, so a must out-rank them all,
    deterministically."""
    from spotify_streaming_etl_pipeline_spark.llm.warc import (
        build_warc,
        warc_record_table,
        outlink_edges,
    )
    from spotify_streaming_etl_pipeline_spark.plans.quality import (
        pagerank_integer,
    )

    def page(name, targets):
        anchors = "".join(
            f'<a href="http://{t}.example.com/">x</a>' for t in targets
        )
        return (
            f"http://{name}.example.com/",
            200,
            "text/html",
            f"<html><body>{anchors}</body></html>".encode(),
        )

    # hub a: in-links from b, c, d; every node has in- and out-degree
    blob = build_warc(
        [page("a", "bd"), page("b", "ac"), page("c", "a"), page("d", "a")],
        member_gzip=True,
    )
    blobs = spark.createDataFrame([(0, bytearray(blob))], "doc_id: long, blob: binary")
    recs = warc_record_table(blobs).filter("status = 200")
    edges = outlink_edges(recs).selectExpr("src AS u", "dst AS v")
    ranks = {r["u"]: r["rk"] for r in pagerank_integer(edges, iters=5).collect()}
    assert set(ranks) == {f"http://{n}.example.com" for n in "abcd"}
    a = ranks["http://a.example.com"]
    assert all(a > v for k, v in ranks.items() if k != "http://a.example.com")
    again = {r["u"]: r["rk"] for r in pagerank_integer(edges, iters=5).collect()}
    assert again == ranks
