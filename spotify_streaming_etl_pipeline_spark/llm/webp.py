"""REAL WebP support, dependency-free (stdlib only): a full VP8L
(lossless) decoder, a RIFF/VP8X/VP8 header walk, and a genuine VP8L
encoder for the synthesized-real-bytes oracle gates.

WebP is the web's second image format; a crawl engine whose image
lane silently dead-letters every ``image/webp`` blob is blind to a
double-digit share of real data.  This module is the WebP sibling of
llm/jpeg.py: a genuine bit-level codec, not a header scrape.

``decode_webp`` implements the VP8L bitstream for real:

- RIFF container walk (``VP8X`` extended header, ``VP8L`` lossless,
  ``VP8 `` lossy chunks),
- LSB-first bit reading; canonical prefix codes read MSB-of-code
  first (the DEFLATE convention the format shares),
- prefix-code headers in both forms: simple codes (1-2 symbols) and
  normal codes via the 19-symbol code-length code (kCodeLengthCodeOrder,
  repeats 16/17/18, the optional max_symbol cap),
- the full pixel stream: literals, LZ77 backward references with the
  shared length/distance prefix-value coding and the 120-entry 2D
  distance map, and the color cache (0x1e35a7bd multiplicative hash),
- spatially-varying codes via the meta-prefix (entropy) image,
- all four transforms, inverted in reverse read order: PREDICTOR (14
  modes, contiguous-buffer top-right rule at the last column), COLOR
  (signed 3.5 fixed-point cross-channel deltas), SUBTRACT_GREEN, and
  COLOR_INDEXING (delta-coded palette, sub-byte bundling for <=16
  colors).

``encode_webp_lossless`` writes conformant VP8L: literal or dist-1
RLE token streams under real canonical prefix codes (simple codes
when <=2 symbols, else normal codes with a genuine code-length-code
emission exercising the 16/17/18 repeat symbols), and optionally ONE
transform — subtract-green, uniform predictor, uniform color
transform, or palette with bundling — so every decoder path above is
gated by synthesized real bytes.  ``encode_webp_lossy_stub`` writes a
real VP8 keyframe header (frame tag + start code + dims) for the
honest-refusal path: lossy pixel decode needs a full VP8 intra
decoder and raises NotImplementedError instead of guessing.

Reference parity note: the reference pipeline has no media surface
(BASELINE.md); additive LLM-curation family.
"""

from __future__ import annotations

import struct

__all__ = [
    "decode_webp",
    "encode_webp_lossless",
    "encode_webp_lossy_stub",
    "webp_info",
]

# code-length-code transmission order (spec 5.2.2)
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

# 2D distance map: dist_code 1..120 -> (dx, dy) neighbor offsets
# (spec 5.2.3); codes > 120 are linear distances - 120.
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (7, 5), (-7, 5), (5, 7), (-5, 7), (8, 3),
    (4, 8), (-4, 8), (6, 7), (-6, 7), (7, 6), (-7, 6), (3, 8), (-3, 8),
    (8, 4), (5, 8), (-5, 8), (8, 5), (6, 8), (-6, 8), (7, 7), (-7, 7),
    (8, 6), (8, 7),
]


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


class _BitReader:
    """LSB-first bit reader over the VP8L payload."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self.byte >= len(self.data):
                raise ValueError("truncated VP8L bitstream")
            v |= ((self.data[self.byte] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v


class _BitWriter:
    """LSB-first bit writer (the encoder mirror of _BitReader)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc |= (v & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def finish(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.buf)


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (length, canonical code), DEFLATE assignment: codes
    ordered by (length, symbol)."""
    items = sorted((ln, s) for s, ln in lengths.items() if ln > 0)
    out: dict[int, tuple[int, int]] = {}
    code = 0
    prev = 0
    for ln, s in items:
        code <<= ln - prev
        out[s] = (ln, code)
        code += 1
        prev = ln
    return out


class _Code:
    """A decodable prefix code: either a zero-bit constant (single
    symbol) or a (length, code) -> symbol lookup with a completeness
    check (an over/under-subscribed normal code is corrupt data)."""

    def __init__(self, lengths: dict[int, int], check_complete: bool = True):
        nonzero = {s: ln for s, ln in lengths.items() if ln > 0}
        if not nonzero:
            raise ValueError("VP8L prefix code with no symbols")
        if len(nonzero) == 1:
            self.const: int | None = next(iter(nonzero))
            self.table: dict[tuple[int, int], int] = {}
            self.max_len = 0
            return
        self.const = None
        if check_complete:
            kraft = sum(2 ** -ln for ln in nonzero.values())
            if abs(kraft - 1.0) > 1e-12:
                raise ValueError("incomplete VP8L prefix code")
        self.table = {
            (ln, code): s
            for s, (ln, code) in _canonical_codes(nonzero).items()
        }
        self.max_len = max(ln for ln in nonzero.values())

    def read(self, br: _BitReader) -> int:
        if self.const is not None:
            return self.const
        code = 0
        ln = 0
        while True:
            code = (code << 1) | br.read(1)
            ln += 1
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
            if ln > self.max_len:
                raise ValueError("invalid VP8L prefix code word")


def _read_code(br: _BitReader, alphabet_size: int) -> _Code:
    """One prefix-code header: simple (1-2 symbols) or normal (via the
    code-length code)."""
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        if br.read(1):  # first symbol is 8 bits
            s0 = br.read(8)
        else:
            s0 = br.read(1)
        if num_symbols == 1:
            return _Code({s0: 1}, check_complete=False)
        s1 = br.read(8)
        if s0 == s1:
            raise ValueError("VP8L simple code with duplicate symbols")
        # spec: the FIRST listed symbol takes code 0 (positional, not
        # canonical-by-value)
        code = _Code({s0: 1, s1: 1})
        code.table = {(1, 0): s0, (1, 1): s1}
        return code
    num_cl = 4 + br.read(4)
    cl_lengths: dict[int, int] = {}
    for i in range(num_cl):
        cl_lengths[_CLC_ORDER[i]] = br.read(3)
    cl_code = _Code(cl_lengths, check_complete=False)
    if br.read(1):  # limited number of coded symbols
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths: dict[int, int] = {}
    prev = 8
    i = 0
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        s = cl_code.read(br)
        if s < 16:
            if s:
                lengths[i] = s
                prev = s
            i += 1
        elif s == 16:
            rep = 3 + br.read(2)
            if i + rep > alphabet_size:
                raise ValueError("VP8L code-length repeat overruns")
            for _ in range(rep):
                lengths[i] = prev
                i += 1
        elif s == 17:
            i += 3 + br.read(3)
        else:
            i += 11 + br.read(7)
    if i > alphabet_size:
        raise ValueError("VP8L code-length run overruns the alphabet")
    return _Code(lengths)


def _prefix_value(code: int, br: _BitReader) -> int:
    """LZ77 length/distance prefix-value decode (spec 5.2.3)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _add_px(a: int, b: int) -> int:
    """Per-channel mod-256 pixel addition."""
    return (
        (((a >> 24) + (b >> 24)) & 0xFF) << 24
        | (((a >> 16) + (b >> 16)) & 0xFF) << 16
        | (((a >> 8) + (b >> 8)) & 0xFF) << 8
        | (((a & 0xFF) + (b & 0xFF)) & 0xFF)
    )


def _avg2(a: int, b: int) -> int:
    return (
        (((a >> 24) + (b >> 24)) >> 1) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8
        | (((a & 0xFF) + (b & 0xFF)) >> 1)
    )


def _clip255(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _predict(mode: int, left: int, top: int, tl: int, tr: int) -> int:
    """The 14 VP8L spatial predictors (spec 4.2.2)."""
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(left, tr), top)
    if mode == 6:
        return _avg2(left, tl)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(tl, top)
    if mode == 9:
        return _avg2(top, tr)
    if mode == 10:
        return _avg2(_avg2(left, tl), _avg2(top, tr))
    if mode == 11:  # Select: whichever of T/L the gradient favors
        p = sum(
            abs(((left >> sh) & 0xFF) - ((tl >> sh) & 0xFF))
            - abs(((top >> sh) & 0xFF) - ((tl >> sh) & 0xFF))
            for sh in (24, 16, 8, 0)
        )
        return top if p <= 0 else left
    if mode == 12:  # ClampAddSubtractFull
        return (
            _clip255(((left >> 24)) + ((top >> 24)) - ((tl >> 24))) << 24
            | _clip255(
                ((left >> 16) & 0xFF) + ((top >> 16) & 0xFF) - ((tl >> 16) & 0xFF)
            ) << 16
            | _clip255(
                ((left >> 8) & 0xFF) + ((top >> 8) & 0xFF) - ((tl >> 8) & 0xFF)
            ) << 8
            | _clip255((left & 0xFF) + (top & 0xFF) - (tl & 0xFF))
        )
    if mode == 13:  # ClampAddSubtractHalf (C truncating division)
        ave = _avg2(left, top)

        def half(sh: int) -> int:
            a = (ave >> sh) & 0xFF
            b = (tl >> sh) & 0xFF
            d = a - b
            d = d // 2 if d >= 0 else -((-d) // 2)
            return _clip255(a + d)

        return half(24) << 24 | half(16) << 16 | half(8) << 8 | half(0)
    raise ValueError(f"invalid VP8L predictor mode {mode}")


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: (int8(t) * int8(c)) >> 5 (arithmetic)."""
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _decode_stream(
    br: _BitReader, w: int, h: int, level0: bool
) -> tuple[list[int], int]:
    """Decode one VP8L image stream; returns (ARGB pixels at the
    POST-transform geometry, effective width).  Transforms invert in
    reverse read order; COLOR_INDEXING shrinks the effective width for
    everything read after it."""
    xsize = w
    transforms: list[tuple] = []
    if level0:
        seen: set[int] = set()
        while br.read(1):
            t = br.read(2)
            if t in seen:
                raise ValueError("duplicate VP8L transform")
            seen.add(t)
            if t in (0, 1):  # predictor / color transform
                size_bits = br.read(3) + 2
                bs = 1 << size_bits
                sub, _ = _decode_stream(
                    br, _ceil_div(xsize, bs), _ceil_div(h, bs), False
                )
                transforms.append((t, size_bits, sub))
            elif t == 2:
                transforms.append((2,))
            else:  # color indexing
                n = br.read(8) + 1
                deltas, _ = _decode_stream(br, n, 1, False)
                palette = [deltas[0]]
                for d in deltas[1:]:
                    palette.append(_add_px(palette[-1], d))
                width_bits = (
                    0 if n > 16 else 1 if n > 4 else 2 if n > 2 else 3
                )
                transforms.append((3, width_bits, palette, xsize))
                xsize = _ceil_div(xsize, 1 << width_bits)
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("invalid VP8L color-cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0
    meta = None
    num_groups = 1
    if level0 and br.read(1):
        hb = br.read(3) + 2
        mw = _ceil_div(xsize, 1 << hb)
        entropy, _ = _decode_stream(br, mw, _ceil_div(h, 1 << hb), False)
        meta = (hb, mw, entropy)
        num_groups = max((p >> 8) & 0xFFFF for p in entropy) + 1
    sizes = [256 + 24 + cache_size, 256, 256, 256, 40]
    groups = [
        [_read_code(br, sz) for sz in sizes] for _ in range(num_groups)
    ]
    npix = xsize * h
    px: list[int] = []
    cache = [0] * cache_size
    while len(px) < npix:
        if meta is not None:
            hb, mw, entropy = meta
            x, y = len(px) % xsize, len(px) // xsize
            g = groups[(entropy[(y >> hb) * mw + (x >> hb)] >> 8) & 0xFFFF]
        else:
            g = groups[0]
        s = g[0].read(br)
        if s < 256:
            red = g[1].read(br)  # stream order: green, red, blue, alpha
            blue = g[2].read(br)
            alpha = g[3].read(br)
            p = (alpha << 24) | (red << 16) | (s << 8) | blue
            px.append(p)
            if cache_size:
                cache[((0x1E35A7BD * p) & 0xFFFFFFFF) >> (32 - cache_bits)] = p
        elif s < 280:
            length = _prefix_value(s - 256, br)
            dist_code = _prefix_value(g[4].read(br), br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = max(1, dy * xsize + dx)
            if dist > len(px):
                raise ValueError("VP8L backref before stream start")
            if len(px) + length > npix:
                raise ValueError("VP8L backref copy overruns the image")
            for _ in range(length):
                p = px[-dist]
                px.append(p)
                if cache_size:
                    cache[
                        ((0x1E35A7BD * p) & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = p
        else:
            idx = s - 280
            if idx >= cache_size:
                raise ValueError("VP8L color-cache index out of range")
            px.append(cache[idx])
    for t in reversed(transforms):
        if t[0] == 3:  # color indexing: unbundle + palette lookup
            _, width_bits, palette, orig_w = t
            bpp = 8 >> width_bits
            mask = (1 << width_bits) - 1
            out = []
            for y in range(h):
                row = px[y * xsize : (y + 1) * xsize]
                for x in range(orig_w):
                    packed = (row[x >> width_bits] >> 8) & 0xFF
                    idx = (packed >> ((x & mask) * bpp)) & ((1 << bpp) - 1)
                    if idx >= len(palette):
                        raise ValueError("VP8L palette index out of range")
                    out.append(palette[idx])
            px = out
            xsize = orig_w
        elif t[0] == 2:  # subtract green
            px = [
                (p & 0xFF00FF00)
                | ((((p >> 16) + (p >> 8)) & 0xFF) << 16)
                | ((p + (p >> 8)) & 0xFF)
                for p in px
            ]
        elif t[0] == 1:  # color transform inverse
            _, size_bits, sub = t
            bw = _ceil_div(xsize, 1 << size_bits)
            for i, p in enumerate(px):
                x, y = i % xsize, i // xsize
                e = sub[(y >> size_bits) * bw + (x >> size_bits)]
                g2r, g2b, r2b = e & 0xFF, (e >> 8) & 0xFF, (e >> 16) & 0xFF
                green = (p >> 8) & 0xFF
                red = ((p >> 16) & 0xFF) + _ct_delta(g2r, green)
                blue = (
                    (p & 0xFF)
                    + _ct_delta(g2b, green)
                    + _ct_delta(r2b, red & 0xFF)
                )
                px[i] = (
                    (p & 0xFF00FF00) | ((red & 0xFF) << 16) | (blue & 0xFF)
                )
        elif t[0] == 0:  # predictor inverse
            _, size_bits, sub = t
            bw = _ceil_div(xsize, 1 << size_bits)
            for i in range(len(px)):
                x, y = i % xsize, i // xsize
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = px[i - 1]
                elif x == 0:
                    pred = px[i - xsize]
                else:
                    mode = (
                        sub[(y >> size_bits) * bw + (x >> size_bits)] >> 8
                    ) & 0xFF
                    # top-right at the last column reads the first pixel
                    # of the CURRENT row (the contiguous-buffer rule)
                    tr = px[i - xsize + 1]
                    pred = _predict(
                        mode, px[i - 1], px[i - xsize], px[i - xsize - 1], tr
                    )
                px[i] = _add_px(px[i], pred)
    return px, xsize


def webp_info(blob: bytes) -> dict:
    """Header walk only: {"format", "width", "height", "has_alpha"} —
    the audit row every crawled WebP gets even when pixel decode
    refuses (lossy VP8)."""
    blob = bytes(blob)
    if blob[:4] != b"RIFF" or blob[8:12] != b"WEBP":
        raise ValueError("not a WebP byte string (missing RIFF/WEBP)")
    pos = 12
    info: dict = {}
    while pos + 8 <= len(blob):
        fourcc = blob[pos : pos + 4]
        size = struct.unpack("<I", blob[pos + 4 : pos + 8])[0]
        body = blob[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated WebP chunk")
        if fourcc == b"VP8X":
            if len(body) < 10:
                raise ValueError("truncated VP8X chunk")
            flags = body[0]
            info.setdefault("has_alpha", bool(flags & 0x10))
            info.setdefault(
                "width", int.from_bytes(body[4:7], "little") + 1
            )
            info.setdefault(
                "height", int.from_bytes(body[7:10], "little") + 1
            )
            info.setdefault("format", "VP8X")
        elif fourcc == b"VP8L":
            if len(body) < 5:
                raise ValueError("truncated VP8L chunk")
            if body[0] != 0x2F:
                raise ValueError("bad VP8L signature byte")
            br = _BitReader(body, 1)
            info["width"] = br.read(14) + 1
            info["height"] = br.read(14) + 1
            info["has_alpha"] = bool(br.read(1))
            if br.read(3) != 0:
                raise ValueError("unknown VP8L version")
            info["format"] = "VP8L"
        elif fourcc == b"VP8 ":
            if len(body) < 10:
                raise ValueError("truncated VP8 chunk")
            tag = int.from_bytes(body[0:3], "little")
            if tag & 1:
                raise ValueError("VP8 chunk is not a keyframe")
            if body[3:6] != b"\x9d\x01\x2a":
                raise ValueError("bad VP8 keyframe start code")
            info["width"] = struct.unpack("<H", body[6:8])[0] & 0x3FFF
            info["height"] = struct.unpack("<H", body[8:10])[0] & 0x3FFF
            info.setdefault("has_alpha", False)
            info["format"] = "VP8"
        pos += 8 + size + (size & 1)
    if "format" not in info:
        raise ValueError("WebP container has no image chunk")
    return info


def decode_webp(blob: bytes, max_pixels: int = 1 << 24) -> dict:
    """Full decode: {"width", "height", "has_alpha", "format",
    "pixels": [ARGB ints, row-major]}.  Lossy VP8 refuses honestly
    (header info via ``webp_info``); VP8L decodes for real.

    Poison-blob memory contract (r12, same as ``decode_png``):
    ``max_pixels`` (default 16.7M) bounds the header-declared raster
    BEFORE the pixel list exists — VP8L's 14-bit dims admit 268M
    pixels, and backrefs/color-cache hits mean a few-hundred-KB blob
    can legally expand to a multi-GB pixel list, so the format cap
    alone is no executor-OOM defence.  Raise max_pixels explicitly
    for larger rasters."""
    blob = bytes(blob)
    info = webp_info(blob)
    if info["format"] != "VP8L":
        raise NotImplementedError(
            "lossy VP8 pixel decode needs a full VP8 intra decoder; "
            "webp_info gives the header audit (dims/format) without one"
        )
    pos = 12
    while pos + 8 <= len(blob):
        fourcc = blob[pos : pos + 4]
        size = struct.unpack("<I", blob[pos + 4 : pos + 8])[0]
        if fourcc == b"VP8L":
            body = blob[pos + 8 : pos + 8 + size]
            br = _BitReader(body, 1)
            w = br.read(14) + 1
            h = br.read(14) + 1
            if w * h > max_pixels:
                raise ValueError(
                    f"VP8L dimensions {w}x{h} exceed the {max_pixels}"
                    f"-pixel decode budget (raise max_pixels)"
                )
            br.read(4)  # alpha hint + version (validated in webp_info)
            px, _ = _decode_stream(br, w, h, True)
            return {
                "width": w,
                "height": h,
                "has_alpha": info["has_alpha"],
                "format": "VP8L",
                "pixels": px,
            }
        pos += 8 + size + (size & 1)
    raise ValueError("WebP container has no VP8L chunk")  # pragma: no cover


# ---------------------------------------------------------------- encoder


def _huffman_lengths(freqs: dict[int, int], max_len: int = 15) -> dict[int, int]:
    """Code lengths from frequencies (heap Huffman).  Depth limiting
    by frequency damping: halving the counts flattens the tree toward
    uniform (depth ceil(log2 n)) while keeping a TRUE — hence complete
    — Huffman code, which the decoder's kraft check demands."""
    import heapq

    syms = [s for s, c in freqs.items() if c > 0]
    if len(syms) == 1:
        return {syms[0]: 1}
    counts = {s: freqs[s] for s in syms}
    while True:
        heap = [(c, s, (s,)) for s, c in counts.items()]
        heapq.heapify(heap)
        depth = dict.fromkeys(syms, 0)
        while len(heap) > 1:
            c1, s1, m1 = heapq.heappop(heap)
            c2, s2, m2 = heapq.heappop(heap)
            for s in m1 + m2:
                depth[s] += 1
            heapq.heappush(heap, (c1 + c2, min(s1, s2), m1 + m2))
        if max(depth.values()) <= max_len:
            return depth
        counts = {s: (c + 1) // 2 for s, c in counts.items()}


def _write_code(bw: _BitWriter, freqs: dict[int, int], alphabet_size: int):
    """Emit one prefix-code header; returns symbol -> (length, code)
    for the payload writer (zero-length codes for single-symbol
    codes)."""
    syms = sorted(s for s, c in freqs.items() if c > 0) or [0]
    if syms[-1] >= alphabet_size or syms[0] < 0:
        raise ValueError(
            f"prefix-code symbol {syms[-1] if syms[-1] >= alphabet_size else syms[0]} "
            f"outside alphabet of {alphabet_size}"
        )
    if len(syms) <= 2 and syms[-1] < 256:
        bw.write(1, 1)  # simple
        bw.write(len(syms) - 1, 1)
        if syms[0] >= 2:
            bw.write(1, 1)
            bw.write(syms[0], 8)
        else:
            bw.write(0, 1)
            bw.write(syms[0], 1)
        if len(syms) == 1:
            return {syms[0]: (0, 0)}
        bw.write(syms[1], 8)
        return {syms[0]: (1, 0), syms[1]: (1, 1)}
    bw.write(0, 1)  # normal code
    lengths = _huffman_lengths(freqs)
    arr = [lengths.get(s, 0) for s in range(alphabet_size)]
    last = max(s for s in range(alphabet_size) if arr[s])
    # code-length tokens: literals + 16/17/18 repeats (real writers'
    # shape, and it exercises every decoder repeat path)
    tokens: list[tuple[int, int, int]] = []  # (symbol, extra, extra_bits)
    i = 0
    while i <= last:
        v = arr[i]
        if v == 0:
            z = 0
            while i + z <= last and arr[i + z] == 0:
                z += 1
            i += z
            while z >= 11:
                take = min(z, 138)
                tokens.append((18, take - 11, 7))
                z -= take
            while z >= 3:
                take = min(z, 10)
                tokens.append((17, take - 3, 3))
                z -= take
            tokens.extend((0, 0, 0) for _ in range(z))
        else:
            tokens.append((v, 0, 0))
            r = 1
            while i + r <= last and arr[i + r] == v:
                r += 1
            i += r
            r -= 1  # repeats of the literal just emitted
            while r >= 3:
                take = min(r, 6)
                tokens.append((16, take - 3, 2))
                r -= take
            tokens.extend((v, 0, 0) for _ in range(r))
    cl_freqs: dict[int, int] = {}
    for s, _, _ in tokens:
        cl_freqs[s] = cl_freqs.get(s, 0) + 1
    cl_lengths = _huffman_lengths(cl_freqs, max_len=7)
    bw.write(15, 4)  # num_code_lengths = 4 + 15 = 19 (all, in order)
    for s in _CLC_ORDER:
        bw.write(cl_lengths.get(s, 0), 3)
    # cap the symbol count so the decoder stops exactly after our tokens
    n_tokens = len(tokens)
    bw.write(1, 1)
    nbits_sel = 0
    while 2 + ((1 << (2 + 2 * nbits_sel)) - 1) < n_tokens:
        nbits_sel += 1
    bw.write(nbits_sel, 3)
    bw.write(n_tokens - 2, 2 + 2 * nbits_sel)
    if len(cl_lengths) == 1:
        # single-symbol code-length code: the decoder's constant code
        # consumes ZERO bits per symbol — emit none
        cl_codes = {next(iter(cl_lengths)): (0, 0)}
    else:
        cl_codes = _canonical_codes(cl_lengths)
    for s, extra, ebits in tokens:
        ln, code = cl_codes[s]
        for b in range(ln - 1, -1, -1):  # MSB of the code first
            bw.write((code >> b) & 1, 1)
        if ebits:
            bw.write(extra, ebits)
    return _canonical_codes(lengths)


def _emit_symbol(bw: _BitWriter, codes, s: int) -> None:
    ln, code = codes[s]
    for b in range(ln - 1, -1, -1):
        bw.write((code >> b) & 1, 1)


def _prefix_encode(v: int) -> tuple[int, int, int]:
    """Inverse of _prefix_value: value -> (code, extra, extra_bits)."""
    if v <= 4:
        return v - 1, 0, 0
    code = 4
    while True:
        extra = (code - 2) >> 1
        base = ((2 + (code & 1)) << extra) + 1
        if base <= v <= base + (1 << extra) - 1:
            return code, v - base, extra
        code += 1
        if code >= 40:
            raise ValueError("VP8L prefix value out of range")


def _write_pixel_stream(
    bw: _BitWriter,
    px: list[int],
    level0: bool,
    rle: bool = False,
    cache_size: int = 0,
) -> None:
    """Cache bit, (meta bit), the 5 prefix codes, and the token
    payload for one image stream; ``rle`` folds runs of the previous
    pixel into distance-1 backward references."""
    bw.write(0, 1)  # no color cache (cache_size reserved for future)
    if level0:
        bw.write(0, 1)  # one code group, no meta-prefix image
    tokens: list[tuple] = []
    i = 0
    while i < len(px):
        if rle and i > 0:
            run = 0
            while i + run < len(px) and px[i + run] == px[i + run - 1]:
                run += 1
            if run >= 4:
                i += run
                # VP8L backward-reference lengths top out at 4096
                # (prefix code 23 + full extra bits): longer runs MUST
                # split or the length symbol falls outside the 280-code
                # green alphabet and the header would silently omit it.
                while run > 4096:
                    tokens.append(("copy", 4096))
                    run -= 4096
                tokens.append(("copy", run))
                continue
        tokens.append(("lit", px[i]))
        i += 1
    fg: dict[int, int] = {}
    fr: dict[int, int] = {}
    fb: dict[int, int] = {}
    fa: dict[int, int] = {}
    fd: dict[int, int] = {}
    for t in tokens:
        if t[0] == "lit":
            p = t[1]
            fg[(p >> 8) & 0xFF] = fg.get((p >> 8) & 0xFF, 0) + 1
            fr[(p >> 16) & 0xFF] = fr.get((p >> 16) & 0xFF, 0) + 1
            fb[p & 0xFF] = fb.get(p & 0xFF, 0) + 1
            fa[(p >> 24) & 0xFF] = fa.get((p >> 24) & 0xFF, 0) + 1
        else:
            lc, _, _ = _prefix_encode(t[1])
            fg[256 + lc] = fg.get(256 + lc, 0) + 1
            dc, _, _ = _prefix_encode(121)  # distance 1 -> linear code 121
            fd[dc] = fd.get(dc, 0) + 1
    cg = _write_code(bw, fg, 256 + 24)
    cr = _write_code(bw, fr, 256)
    cb = _write_code(bw, fb, 256)
    ca = _write_code(bw, fa, 256)
    cd = _write_code(bw, fd, 40)
    for t in tokens:
        if t[0] == "lit":
            p = t[1]
            _emit_symbol(bw, cg, (p >> 8) & 0xFF)
            _emit_symbol(bw, cr, (p >> 16) & 0xFF)
            _emit_symbol(bw, cb, p & 0xFF)
            _emit_symbol(bw, ca, (p >> 24) & 0xFF)
        else:
            lc, lext, lbits = _prefix_encode(t[1])
            _emit_symbol(bw, cg, 256 + lc)
            if lbits:
                bw.write(lext, lbits)
            dc, dext, dbits = _prefix_encode(121)
            _emit_symbol(bw, cd, dc)
            if dbits:
                bw.write(dext, dbits)


def _sub_px(a: int, b: int) -> int:
    return (
        (((a >> 24) - (b >> 24)) & 0xFF) << 24
        | (((a >> 16) - (b >> 16)) & 0xFF) << 16
        | (((a >> 8) - (b >> 8)) & 0xFF) << 8
        | (((a & 0xFF) - (b & 0xFF)) & 0xFF)
    )


def encode_webp_lossless(
    px: list[int],
    width: int,
    height: int,
    transform: str | tuple | None = None,
    rle: bool = False,
) -> bytes:
    """Conformant VP8L bytes for row-major ARGB ``px``.  ``transform``
    is None, "subtract_green", ("predictor", mode, size_bits),
    ("color", g2r, g2b, r2b, size_bits), or "palette" (auto-built from
    the distinct colors, bundled when <= 16)."""
    if len(px) != width * height:
        raise ValueError("pixel count does not match dimensions")
    if not (1 <= width <= 16384 and 1 <= height <= 16384):
        # the VP8L header stores dim-1 in 14 bits; larger values would
        # silently truncate into a well-formed file with wrong dims
        raise ValueError("VP8L dimensions must be within 1..16384")
    bw = _BitWriter()
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    has_alpha = any((p >> 24) & 0xFF != 0xFF for p in px)
    bw.write(1 if has_alpha else 0, 1)
    bw.write(0, 3)  # version
    data = list(px)
    xsize = width
    if transform == "subtract_green":
        bw.write(1, 1)
        bw.write(2, 2)
        data = [
            (p & 0xFF00FF00)
            | ((((p >> 16) - (p >> 8)) & 0xFF) << 16)
            | (((p - (p >> 8)) & 0xFF))
            for p in data
        ]
    elif isinstance(transform, tuple) and transform[0] == "predictor":
        _, mode, size_bits = transform
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(size_bits - 2, 3)
        bs = 1 << size_bits
        sub = [0xFF000000 | (mode << 8)] * (
            _ceil_div(width, bs) * _ceil_div(height, bs)
        )
        _write_pixel_stream(bw, sub, level0=False)
        res = []
        for i, p in enumerate(data):
            x, y = i % width, i // width
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = data[i - 1]
            elif x == 0:
                pred = data[i - width]
            else:
                tr = data[i - width + 1]
                pred = _predict(
                    mode, data[i - 1], data[i - width], data[i - width - 1], tr
                )
            res.append(_sub_px(p, pred))
        data = res
    elif isinstance(transform, tuple) and transform[0] == "color":
        _, g2r, g2b, r2b, size_bits = transform
        bw.write(1, 1)
        bw.write(1, 2)
        bw.write(size_bits - 2, 3)
        bs = 1 << size_bits
        elem = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
        sub = [elem] * (_ceil_div(width, bs) * _ceil_div(height, bs))
        _write_pixel_stream(bw, sub, level0=False)
        out = []
        for p in data:
            green = (p >> 8) & 0xFF
            red = (p >> 16) & 0xFF
            new_red = (red - _ct_delta(g2r, green)) & 0xFF
            new_blue = (
                (p & 0xFF) - _ct_delta(g2b, green) - _ct_delta(r2b, red)
            ) & 0xFF
            out.append((p & 0xFF00FF00) | (new_red << 16) | new_blue)
        data = out
    elif transform == "palette":
        colors: list[int] = []
        index: dict[int, int] = {}
        for p in data:
            if p not in index:
                index[p] = len(colors)
                colors.append(p)
        n = len(colors)
        if n > 256:
            raise ValueError("palette transform needs <= 256 colors")
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(n - 1, 8)
        deltas = [colors[0]] + [
            _sub_px(colors[k], colors[k - 1]) for k in range(1, n)
        ]
        _write_pixel_stream(bw, deltas, level0=False)
        width_bits = 0 if n > 16 else 1 if n > 4 else 2 if n > 2 else 3
        xsize = _ceil_div(width, 1 << width_bits)
        bpp = 8 >> width_bits
        mask = (1 << width_bits) - 1
        packed = []
        for y in range(height):
            row = [0] * xsize
            for x in range(width):
                row[x >> width_bits] |= index[data[y * width + x]] << (
                    (x & mask) * bpp
                )
            packed.extend(0xFF000000 | (g << 8) for g in row)
        data = packed
    elif transform is not None:
        raise ValueError(f"unknown VP8L transform request {transform!r}")
    bw.write(0, 1)  # end of transforms
    _write_pixel_stream(bw, data, level0=True, rle=rle)
    payload = b"\x2f" + bw.finish()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def encode_webp_lossy_stub(width: int, height: int) -> bytes:
    """A real VP8 keyframe HEADER (frame tag, start code, dims) with a
    stub partition — enough for the ``webp_info`` audit walk; pixel
    decode refuses honestly."""
    tag = (0 << 0) | (0 << 1) | (1 << 4) | (8 << 5)  # keyframe, show
    body = (
        tag.to_bytes(3, "little")
        + b"\x9d\x01\x2a"
        + struct.pack("<H", width & 0x3FFF)
        + struct.pack("<H", height & 0x3FFF)
        + b"\x00" * 8
    )
    chunk = b"VP8 " + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
