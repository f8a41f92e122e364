"""Units for the subset-PDF codec (llm/pdf.py): writer/extractor
round-trips, string escapes, hex strings and TJ arrays, page trees,
FlateDecode, contents arrays, incremental-update semantics, honest
refusals, and the Spark dead-letter stage."""

from __future__ import annotations

import zlib

import pytest

from spotify_streaming_etl_pipeline_spark.llm import multimodal
from spotify_streaming_etl_pipeline_spark.llm.pdf import (
    _page_text,
    encode_pdf,
    extract_pdf_text,
)


def test_roundtrip_multipage_and_escapes():
    pages = [
        ["Hello world.", "Parens (nested (deep)) and \\ slash"],
        ["Page two, line one", "tab\tand\nnewline escapes"],
        [],
    ]
    out = extract_pdf_text(encode_pdf(pages))
    assert out["n_pages"] == 3
    assert out["pages"][0] == "\n".join(pages[0])
    assert out["pages"][1] == "\n".join(pages[1])
    assert out["pages"][2] == ""
    assert out["text"].count("\f") == 2


def test_flate_compressed_streams_roundtrip():
    pages = [["compressed line %d" % i for i in range(5)]]
    raw = extract_pdf_text(encode_pdf(pages, compress=False))
    comp = extract_pdf_text(encode_pdf(pages, compress=True))
    assert raw["pages"] == comp["pages"]


def test_text_operators_tj_arrays_hex_and_quotes():
    # TJ with kerning numbers joins; hex strings decode; ' breaks line
    s = b"BT [(ab) -120 (cd)] TJ 0 -14 Td <414243> Tj (x)' (y)\" ET"
    assert _page_text(s) == "abcd\nABC\nx\ny"
    # octal escapes and balanced parens inside literals
    assert _page_text(rb"BT (\101\102(in)\051) Tj ET") == "AB(in))"


def test_contents_array_concatenates_in_order():
    pdf = bytearray(encode_pdf([["first"], ["second"]]))
    # page 1's /Contents 5 0 R -> rewrite to [5 0 R 7 0 R]: page one
    # must now show both streams' text in order
    pdf = bytes(pdf).replace(b"/Contents 5 0 R", b"/Contents [5 0 R 7 0 R]")
    out = extract_pdf_text(pdf)
    assert out["pages"][0] == "first\nsecond"


def test_incremental_update_later_object_wins():
    base = encode_pdf([["old text"]])
    # append an update redefining content object 5 (classic
    # incremental-update layout: new body after the old %%EOF)
    new_stream = b"BT /F1 12 Tf 72 720 Td (new text) Tj ET"
    update = (
        b"5 0 obj\n<< /Length %d >>\nstream\n" % len(new_stream)
        + new_stream
        + b"\nendstream\nendobj\n"
    )
    assert extract_pdf_text(base + update)["pages"] == ["new text"]


def test_refusals_and_poison():
    with pytest.raises(ValueError):
        extract_pdf_text(b"not a pdf")
    enc = encode_pdf([["x"]]).replace(
        b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R"
    )
    with pytest.raises(ValueError, match="Encrypt"):
        extract_pdf_text(enc)  # /Encrypt pointing at a missing object
    dct = encode_pdf([["x"]]).replace(b"<< /Length", b"<< /Filter /DCTDecode /Length")
    with pytest.raises(NotImplementedError, match="filter"):
        extract_pdf_text(dct)
    # corrupt zlib body in a declared-Flate stream
    broken = encode_pdf([["x"]], compress=True)
    i = broken.find(b"stream\n", broken.find(b"FlateDecode")) + 7
    broken = broken[:i] + b"\x00\x00\x00\x00" + broken[i + 4 :]
    with pytest.raises(ValueError, match="FlateDecode"):
        extract_pdf_text(broken)


def test_pdf_text_features_dead_letters(spark):
    docs = spark.createDataFrame([(0,), (1,), (2,)], "doc_id: long")
    media = multimodal.synth_pdf_corpus(docs)
    poisoned = media.unionByName(
        spark.createDataFrame(
            [(9, bytearray(b"%PDF-1.4 broken")), (10, bytearray(b"junk"))],
            "doc_id: long, blob: binary",
        )
    )
    got = {
        r["doc_id"]: r
        for r in multimodal.pdf_text_features(poisoned).collect()
    }
    assert got[9].text is None and got[10].text is None
    # doc 0: 1 page, 2 lines; arithmetic text
    assert got[0].n_pages == 1
    assert got[0].text == "[00000:0:0] word00.\n[00000:0:1] word01."
    assert got[2].n_pages == 3
    assert got[1].n_chars == len(got[1].text)


def test_objstm_packed_document_extracts():
    """PDF 1.5 layout: catalog/pages/page dictionaries packed inside
    a FlateDecode /ObjStm, content stream classic, NO trailer (the
    xref-stream style) — the object scan + ObjStm expansion + the
    /Catalog fallback must still find and extract the page."""
    bodies = [
        (1, b"<< /Type /Catalog /Pages 3 0 R >>"),
        (3, b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>"),
        (4, b"<< /Type /Page /Parent 3 0 R /Contents 5 0 R >>"),
    ]
    offs, payload = [], b""
    for num, b in bodies:
        offs.append((num, len(payload)))
        payload += b + b" "
    head = " ".join("%d %d" % o for o in offs).encode() + b" "
    data = zlib.compress(head + payload)
    objstm = (
        b"2 0 obj\n<< /Type /ObjStm /N 3 /First %d /Filter /FlateDecode "
        b"/Length %d >>\nstream\n" % (len(head), len(data))
        + data
        + b"\nendstream\nendobj\n"
    )
    content = b"BT /F1 12 Tf 72 720 Td (objstm text) Tj ET"
    classic = (
        b"5 0 obj\n<< /Length %d >>\nstream\n" % len(content)
        + content
        + b"\nendstream\nendobj\n"
    )
    pdf = b"%PDF-1.5\n" + objstm + classic + b"%%EOF\n"
    out = extract_pdf_text(pdf)
    assert out["n_pages"] == 1
    assert out["pages"][0] == "objstm text"


def test_classic_definition_outranks_objstm_copy():
    """An ObjStm copy of an object must not displace a classic
    (incremental-update) definition of the same number."""
    base = encode_pdf([["classic wins"]])
    # pack a BOGUS page 4 redefinition inside an appended ObjStm
    body = b"<< /Type /Page /Parent 2 0 R >>"
    head = b"4 0 "
    data = zlib.compress(head + body)
    stm = (
        b"9 0 obj\n<< /Type /ObjStm /N 1 /First %d /Filter /FlateDecode "
        b"/Length %d >>\nstream\n" % (len(head), len(data))
        + data
        + b"\nendstream\nendobj\n"
    )
    assert extract_pdf_text(base + stm)["pages"] == ["classic wins"]


def test_pdf_roundtrip_property():
    """Randomized writer/extractor round-trip: any latin-1 page/line
    structure survives encode -> extract exactly, compressed or not
    (hypothesis when available, a seeded battery otherwise)."""
    try:
        from hypothesis import given, settings, strategies as st
    except ImportError:  # pragma: no cover - hypothesis is baked in
        import random

        rng = random.Random(3)
        for _ in range(8):
            pages = [
                [
                    "".join(
                        chr(rng.randrange(32, 255))
                        for _ in range(rng.randrange(0, 40))
                    )
                    for _ in range(rng.randrange(0, 4))
                ]
                for _ in range(rng.randrange(1, 4))
            ]
            for comp in (False, True):
                out = extract_pdf_text(encode_pdf(pages, compress=comp))
                assert out["pages"] == ["\n".join(p) for p in pages]
        return

    line = st.text(
        st.characters(min_codepoint=32, max_codepoint=254),
        max_size=40,
    ).filter(lambda s: s.strip() != "")
    pages_strat = st.lists(
        st.lists(line, max_size=4), min_size=1, max_size=3
    )

    @settings(max_examples=12, deadline=None)
    @given(pages=pages_strat, comp=st.booleans())
    def prop(pages, comp):
        out = extract_pdf_text(encode_pdf(pages, compress=comp))
        assert out["n_pages"] == len(pages)
        assert out["pages"] == ["\n".join(p) for p in pages]

    prop()


def _reencode_stream(pdf: bytes, payload: bytes, filt: bytes) -> bytes:
    """Swap the (single) content stream of a 1-page writer PDF for a
    re-encoded payload under a declared filter chain."""
    i = pdf.find(b"5 0 obj")
    j = pdf.find(b"endobj", i)
    new = (
        b"5 0 obj\n<< /Filter %s /Length %d >>\nstream\n" % (filt, len(payload))
        + payload
        + b"\nendstream\n"
    )
    # offsets in the xref are now stale for objects after 5 — the
    # extractor's object SCAN must not care
    return pdf[:i] + new + pdf[j:]


def test_filter_family_and_chains():
    import base64

    src = encode_pdf([["filter family text", "line two"]])
    content = b"BT /F1 12 Tf 72 720 Td (filter family text) Tj 0 -14 Td (line two) Tj ET"
    cases = [
        (base64.a85encode(content) + b"~>", b"/ASCII85Decode"),
        (content.hex().encode() + b">", b"/ASCIIHexDecode"),
        (
            base64.a85encode(zlib.compress(content)) + b"~>",
            b"[/ASCII85Decode /FlateDecode]",
        ),
        (
            zlib.compress(content).hex().encode() + b">",
            b"[/ASCIIHexDecode /FlateDecode]",
        ),
    ]
    for payload, filt in cases:
        out = extract_pdf_text(_reencode_stream(src, payload, filt))
        assert out["pages"] == ["filter family text\nline two"], filt


def test_runlength_decode():
    from spotify_streaming_etl_pipeline_spark.llm.pdf import (
        _runlength_decode,
    )

    # 3 literals, a run of 4 'A's (257-253), EOD
    data = bytes([2]) + b"xyz" + bytes([253]) + b"A" + bytes([128])
    assert _runlength_decode(data) == b"xyzAAAA"


def test_lzw_roundtrip_against_reference_encoder():
    """Mirror-encoder check: a spec LZW encoder (EarlyChange=1) built
    against the same tables round-trips through _lzw_decode for
    random byte strings."""
    import random

    from spotify_streaming_etl_pipeline_spark.llm.pdf import _lzw_decode

    def lzw_encode(data: bytes) -> bytes:
        table = {bytes([i]): i for i in range(256)}
        next_code = 258
        width = 9
        out = []
        bits = []

        def emit(code):
            bits.append((code, width))

        emit(256)  # clear
        w = b""
        for ch in data:
            wc = w + bytes([ch])
            if wc in table:
                w = wc
                continue
            emit(table[w])
            table[wc] = next_code
            next_code += 1
            # EarlyChange: widen one code early
            if next_code + 1 > (1 << width) and width < 12:
                width += 1
            w = bytes([ch])
        if w:
            emit(table[w])
        emit(257)  # EOD
        acc = n = 0
        buf = bytearray()
        for code, wd in bits:
            acc = (acc << wd) | code
            n += wd
            while n >= 8:
                n -= 8
                buf.append((acc >> n) & 0xFF)
        if n:
            buf.append((acc << (8 - n)) & 0xFF)
        return bytes(buf)

    rng = random.Random(5)
    for trial in range(6):
        n = rng.randrange(1, 2000)
        data = bytes(rng.randrange(4) * 60 for _ in range(n))  # runs
        assert _lzw_decode(lzw_encode(data)) == data, trial
    text = b"abcabcabcabc the quick brown fox " * 40
    assert _lzw_decode(lzw_encode(text)) == text


def test_marked_content_dicts_and_inline_images_skip():
    """Real-world tagged PDFs (Word/LaTeX/browser output) wrap text in
    marked content — '/P <</MCID 0>> BDC' — whose '<<' must skip as a
    balanced dict, never parse as a hex string; and 'BI .. ID <binary>
    EI' inline images must skip to the whitespace-delimited EI so raw
    sample bytes (which can contain '(' '<' operator-lookalikes) never
    reach the tokenizer."""
    s = b"/P <</MCID 0>> BDC BT (tagged) Tj ET EMC"
    assert _page_text(s) == "tagged"
    # nested dict value + literal string inside the property dict
    s2 = b"/Span <</ActualText (not shown >>) /L <</N 1>> >> BDC BT (real) Tj ET"
    assert _page_text(s2) == "real"
    img = (
        b"BT (before) Tj ET\n"
        b"BI /W 4 /H 2 /CS /RGB /BPC 8 ID \x00(\x3c\x28garbage\xff EI bits EI\n"
        b"BT 0 -14 Td (after) Tj ET"
    )
    # first whitespace-delimited EI ends the image ('EI' glued inside
    # the sample run does not)
    assert _page_text(img) == "before\nafter"
    # full-document form: splice marked content + an inline image into
    # a writer page
    content = (
        b"/P <</MCID 0>> BDC BT /F1 12 Tf 72 720 Td (doc text) Tj ET EMC\n"
        b"BI /W 1 /H 1 ID \xde\xad\xbe\xef EI"
    )
    out = extract_pdf_text(
        _reencode_stream(
            encode_pdf([["x"]]), zlib.compress(content), b"/FlateDecode"
        )
    )
    assert out["pages"] == ["doc text"]


def test_stream_length_slices_exactly_trailing_cr_payload():
    """A conformant stream whose LAST PAYLOAD BYTE is \\r must not
    lose it to the EOL-trim heuristic when /Length is present — a
    Flate payload ending in \\r would fail its checksum."""
    # tune the adler32 low byte to \r by padding the shown string with
    # 'A's (odd byte value -> cycles every residue within 256 steps)
    content = None
    for j in range(512):
        cand = b"BT /F1 12 Tf 72 720 Td (cr tail %s) Tj ET" % (b"A" * j)
        if zlib.compress(cand).endswith(b"\r"):
            content = cand
            break
    assert content is not None, "no zlib payload ending in CR found"
    payload = zlib.compress(content)
    pdf = _reencode_stream(encode_pdf([["x"]]), payload, b"/FlateDecode")
    out = extract_pdf_text(pdf)
    assert out["pages"] == [content[content.find(b"(") + 1 : content.find(b")")].decode()]
    # and an INDIRECT /Length resolves: point it at a new object
    ind = pdf.replace(
        b"/Length %d >>" % len(payload), b"/Length 99 0 R >>"
    ) + b"99 0 obj\n%d\nendobj\n" % len(payload)
    assert extract_pdf_text(ind)["pages"] == out["pages"]


def test_hostile_pdfs_dead_letter_not_task_kill(spark):
    """An ObjStm missing /First (TypeError pre-fix) and a /Kids cycle
    (RecursionError pre-fix) must raise cleanly in extract_pdf_text
    and NULL OUT through pdf_text_features — one hostile crawled blob
    must never kill the Spark task."""
    # ObjStm without /First
    objstm = (
        b"%PDF-1.5\n1 0 obj\n<< /Type /ObjStm /N 1 /Length 4 >>\n"
        b"stream\nxxxx\nendstream\nendobj\n"
    )
    with pytest.raises(ValueError, match="ObjStm"):
        extract_pdf_text(objstm)
    # /Kids cycle: pages tree 2 -> kid 4 -> kid 2 (cycle) plus a real
    # leaf; must terminate and extract the leaf
    cyc = encode_pdf([["leaf text"]]).replace(
        b"/Kids [4 0 R]", b"/Kids [8 0 R 4 0 R]"
    ) + (
        b"8 0 obj\n<< /Type /Pages /Kids [2 0 R] /Count 0 >>\nendobj\n"
    )
    out = extract_pdf_text(cyc)
    assert out["pages"] == ["leaf text"]
    # both shapes (and a deep-recursion page tree) through the Spark
    # dead-letter stage
    media = spark.createDataFrame(
        [(1, bytearray(objstm)), (2, bytearray(cyc))],
        "doc_id: long, blob: binary",
    )
    got = {r["doc_id"]: r for r in multimodal.pdf_text_features(media).collect()}
    assert got[1].text is None
    assert got[2].text == "leaf text"


def test_type0_tounicode_extraction():
    """Type0/Identity-H documents (the modern writer shape) must
    extract CORRECT Unicode via the /ToUnicode CMap — the CIDs are
    sequential, deliberately NOT codepoints, so latin-1 identity would
    come out as control-byte soup, not the text."""
    pages = [
        ["Hello world", "abcdef ranges fold"],
        ["CJK: 深度学习语料", "emoji 😀 survives surrogates"],
    ]
    for comp in (False, True):
        out = extract_pdf_text(encode_pdf(pages, compress=comp, type0=True))
        assert out["n_pages"] == 2
        assert out["pages"] == ["\n".join(p) for p in pages], comp


def test_tounicode_bfrange_array_form_and_unmapped_cids():
    """The bfrange ARRAY form ([<d1> <d2> ..]) maps explicitly; CIDs
    missing from the CMap decode to U+FFFD, never silently drop."""
    from spotify_streaming_etl_pipeline_spark.llm.pdf import (
        _decode_shown,
        _parse_tounicode,
    )

    cmap = _parse_tounicode(
        b"/CIDInit begincmap\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"1 beginbfrange\n<0005> <0007> [<0058> <0059005A> <4F60>]\n"
        b"endbfrange\n"
        b"1 beginbfchar\n<0010> <D83DDE00>\nendbfchar\nendcmap"
    )
    assert _decode_shown(b"\x00\x05\x00\x06\x00\x07", cmap) == "XYZ你"
    assert _decode_shown(b"\x00\x10", cmap) == "😀"
    assert _decode_shown(b"\x00\x99", cmap) == "�"  # unmapped CID


def test_resources_inherit_from_page_tree():
    """/Resources on the Pages NODE applies to leaf pages that lack
    their own (spec 7.7.3.4) — the CMap must still be found."""
    pdf = encode_pdf([["inherited fonts work"]], type0=True)
    # move the /Resources dict from the page onto the Pages node
    res = b"/Resources << /Font << /F1 3 0 R >> >> "
    assert res in pdf
    pdf = pdf.replace(res, b"", 1).replace(
        b"/Count 1 >>", b"/Count 1 " + res + b">>", 1
    )
    out = extract_pdf_text(pdf)
    assert out["pages"] == ["inherited fonts work"]


def test_rc4_encrypted_documents_decrypt():
    """The legacy-crawl encryption shape — standard security handler,
    RC4 V1/R2, empty user password — must DECRYPT, not dead-letter:
    real /O and /U entries (Algorithms 2/3/4), per-object keys, every
    stream RC4'd.  Wrong passwords raise; AES (V>=4) refuses
    honestly."""
    pages = [["secret line one", "line two"], ["page two text"]]
    want = ["\n".join(p) for p in pages]
    for comp in (False, True):
        for t0 in (False, True):
            blob = encode_pdf(pages, compress=comp, type0=t0, encrypt="")
            assert extract_pdf_text(blob)["pages"] == want, (comp, t0)
    blob = encode_pdf(pages, encrypt="hunter2")
    assert extract_pdf_text(blob, password="hunter2")["pages"] == want
    with pytest.raises(ValueError, match="password"):
        extract_pdf_text(blob)  # empty password is wrong here
    # genuinely unsupported generations refuse with the version named
    v6 = encode_pdf(pages, encrypt="").replace(b"/V 1 /R 2", b"/V 6 /R 7")
    with pytest.raises(NotImplementedError, match="V=6"):
        extract_pdf_text(v6)


def test_aes_encrypted_documents_decrypt():
    """AES generations of the standard security handler: /AESV2
    (V4/R4, AES-128-CBC, per-object 'sAlT' keys, per-stream IVs) and
    AES-256 (V5/R6, Algorithm-2.B KDF, /UE-wrapped file key) both
    decrypt for real; wrong passwords raise; an unknown V4 crypt
    filter refuses honestly."""
    pages = [["aes secret line", "second line"], ["page two here"]]
    want = ["\n".join(p) for p in pages]
    for v in (4, 5):
        for comp in (False, True):
            blob = encode_pdf(
                pages, compress=comp, type0=comp, encrypt="",
                encrypt_version=v,
            )
            assert extract_pdf_text(blob)["pages"] == want, (v, comp)
        blob = encode_pdf(pages, encrypt="pw123", encrypt_version=v)
        assert extract_pdf_text(blob, password="pw123")["pages"] == want
        with pytest.raises(ValueError, match="password"):
            extract_pdf_text(blob)
    odd = encode_pdf(pages, encrypt="", encrypt_version=4).replace(
        b"/CFM /AESV2", b"/CFM /Weird9"
    )
    with pytest.raises(NotImplementedError, match="crypt filter"):
        extract_pdf_text(odd)


def test_rc4_algorithm_anchors():
    """RC4 spec anchor (the classic 'Key'/'Plaintext' test vector) and
    the security-handler key derivation plumbing."""
    from spotify_streaming_etl_pipeline_spark.llm.pdf import (
        _object_key,
        _rc4,
    )

    assert _rc4(b"Key", b"Plaintext") == bytes.fromhex("bbf316e8d940af0ad3")
    assert _rc4(b"Key", _rc4(b"Key", b"roundtrip")) == b"roundtrip"
    # per-object keys differ by object number and cap at 16 bytes
    k = bytes(range(5))
    assert _object_key(k, 1) != _object_key(k, 2)
    assert len(_object_key(k, 1)) == 10
    assert len(_object_key(bytes(range(16)), 1)) == 16


def test_mutation_fuzz_raises_cleanly():
    """Seeded mutation fuzz over an encrypted+compressed document:
    corrupted bytes must raise ordinary data errors (everything the
    Spark dead-letter stage catches), never hang."""
    import random

    rng = random.Random(99)
    base = encode_pdf(
        [["fuzz target text", "line two"]],
        compress=True, encrypt="", encrypt_version=4,
    )
    for _ in range(150):
        b = bytearray(base)
        for _ in range(rng.randrange(1, 4)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            extract_pdf_text(bytes(b))
        except Exception:
            pass  # any exception dead-letters; the assertion is "no hang"


def test_xref_stream_encrypted_document_decrypts():
    """PDF 1.5+ cross-reference-stream documents carry the trailer
    dictionary (with /Encrypt and /ID) inside a /Type /XRef stream
    object and have NO classic 'trailer' keyword — _crypt_setup must
    find /Encrypt there or the document silently 'extracts' as noise
    (r11 ADVICE)."""
    import re as _re

    pages = [["xref stream secret"], ["page two"]]
    want = ["xref stream secret", "page two"]
    blob = encode_pdf(pages, encrypt="")
    tr = blob[blob.rfind(b"trailer") :]
    menc = _re.search(rb"/Encrypt (\d+) 0 R", tr)
    mid = _re.search(rb"/ID \[<([0-9A-Fa-f]+)> <([0-9A-Fa-f]+)>\]", tr)
    assert menc and mid
    head = blob[: blob.rfind(b"xref\n0 ")]
    nums = [int(n) for n in _re.findall(rb"(\d+) 0 obj", head)]
    xref_obj = (
        b"%d 0 obj\n<< /Type /XRef /Size %d /W [1 2 1] /Root 1 0 R"
        b" /Encrypt %s 0 R /ID [<%s> <%s>] /Length 0 >>\n"
        b"stream\n\nendstream\nendobj\n"
        % (
            max(nums) + 1,
            max(nums) + 2,
            menc.group(1),
            mid.group(1),
            mid.group(2),
        )
    )
    doc = head + xref_obj + b"startxref\n%d\n%%%%EOF\n" % len(head)
    assert b"trailer" not in doc
    assert extract_pdf_text(doc)["pages"] == want
