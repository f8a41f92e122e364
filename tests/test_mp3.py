"""Units for the MPEG-1 Layer III codec (llm/mp3.py): encoder/decoder
round trips across block types and channel modes, filterbank band
routing, exact-silence guarantee, the bit reservoir, honest refusals
for everything outside the embedded registry, and the Spark
dead-letter / fingerprint integration."""

from __future__ import annotations

import random

import pytest

from spotify_streaming_etl_pipeline_spark.llm import multimodal
from spotify_streaming_etl_pipeline_spark.llm.mp3 import (
    _BITRATES,
    decode_mp3,
    encode_mp3,
)


def _gran(gg=210, sfc=0, pairs=(), quads=(), bt=0, sbg=(0, 0, 0), sfs=0):
    return {
        "global_gain": gg,
        "scalefac_compress": sfc,
        "big_pairs": list(pairs),
        "quads": list(quads),
        "block_type": bt,
        "subblock_gain": sbg,
        "scalefac_scale": sfs,
    }


def test_silence_is_exactly_silent():
    frames = [[[_gran()], [_gran()]] for _ in range(3)]
    out = decode_mp3(encode_mp3(frames))
    assert out["n_frames"] == 3
    assert out["n_samples"] == 3 * 1152
    assert out["nz_lines"] == 0
    assert out["max_abs"] == 0.0
    assert max(abs(s) for s in out["samples"]) == 0


def test_integer_diagnostics_by_construction():
    g = _gran(
        gg=180, sfc=5,
        pairs=[(1, 1), (1, -1), (-1, 0)],
        quads=[(1, 0, 0, 1), (0, 1, 1, 0)],
    )
    out = decode_mp3(encode_mp3([[[g], [g]]]))
    # pairs: 5 nonzero lines; quads: 4 -> 9 per granule, x2 granules
    assert out["nz_lines"] == 18
    assert out["ix_abs_sum"] == 18
    assert out["gg_sum"] == 2 * 180
    # sfc=5 -> slen (1,1): 21 long bands of maxed value 1
    assert out["sf_sum"] == 2 * 21
    assert out["max_abs"] > 0.0


def test_short_blocks_decode_and_count():
    gs = _gran(gg=170, sfc=9, pairs=[(1, 0)], quads=[(1, 1, 0, 0)],
               bt=2, sbg=(1, 0, 2))
    out = decode_mp3(encode_mp3([[[gs], [gs]]]))
    assert out["nz_lines"] == 2 * 3
    # sfc=9 -> slen (2,2): 36 short scalefactors of maxed value 3
    assert out["sf_sum"] == 2 * 36 * 3
    assert out["max_abs"] > 0.0


def test_stereo_and_ms_matrixing():
    g = _gran(pairs=[(1, -1)], quads=[(1, 0, 0, 1)])
    st = [[[g, g], [g, g]]]
    out = decode_mp3(encode_mp3(st, mode=0))
    assert (out["channels"], out["n_samples"]) == (2, 1152)
    assert len(out["samples"]) == 2 * 1152
    ms = decode_mp3(encode_mp3(st, mode=1, mode_ext=2))
    assert ms["channels"] == 2
    # identical M and S spectra: R = (M - S)/sqrt(2) = 0 exactly
    right = ms["samples"][1::2]
    assert max(abs(s) for s in right) == 0
    assert max(abs(s) for s in ms["samples"][0::2]) > 0


def test_filterbank_band_routing():
    """A single spectral line must land in ITS subband — pinned with
    numpy FFT.  (Constant per-granule MDCT coefficients are not a
    pure tone — TDAC phase — so the pin is band-energy confinement,
    with a one-bin margin for lines at the band boundary.)"""
    np = pytest.importorskip("numpy")
    for line, sb in ((4, 0), (10, 0), (30, 1), (100, 5)):
        pairs = [(0, 0)] * (line // 2)
        pairs.append((1, 0) if line % 2 == 0 else (0, 1))
        g = _gran(pairs=pairs)
        out = decode_mp3(encode_mp3([[[g], [g]] for _ in range(6)]))
        x = np.array(out["samples"], float)[1152:]
        spec = np.abs(np.fft.rfft(x * np.hanning(len(x)))) ** 2
        freqs = np.fft.rfftfreq(len(x), 1 / 44100)
        margin = 44100 / len(x) * 2
        band = (freqs >= sb * 689.0625 - margin) & (
            freqs <= (sb + 1) * 689.0625 + margin
        )
        frac = spec[band].sum() / spec.sum()
        assert frac > 0.95, (line, sb, frac)


def test_bit_reservoir_reaches_back():
    """main_data_begin > 0: granule bytes moved into the previous
    frame's stuffing region must decode identically."""
    g = _gran(gg=190, sfc=3, pairs=[(1, 1), (-1, 1)],
              quads=[(1, 0, 0, 1)])
    frames = [[[_gran()], [_gran()]], [[g], [g]]]
    base = encode_mp3(frames)
    want = decode_mp3(base)
    flen = 144 * _BITRATES[12] * 1000 // 44100
    f1, f2 = bytearray(base[:flen]), bytearray(base[flen:])
    side_len = 17
    # frame 2's main data = everything after header+side until padding
    main2 = bytes(f2[4 + side_len :]).rstrip(b"\x00")
    k = min(5, len(main2))
    assert k > 0
    # stash the first k bytes at the END of frame 1 (its stuffing tail
    # is zeros by construction)
    assert f1[-k:] == b"\x00" * k
    f1[-k:] = main2[:k]
    # shift frame 2's main data left by k, re-pad, set main_data_begin
    rest = main2[k:]
    f2[4 + side_len :] = rest + b"\x00" * (flen - 4 - side_len - len(rest))
    f2[4] = k >> 1
    f2[5] = (f2[5] & 0x7F) | ((k & 1) << 7)
    out = decode_mp3(bytes(f1 + f2))
    for key in ("nz_lines", "ix_abs_sum", "sf_sum", "gg_sum", "n_samples"):
        assert out[key] == want[key], key
    assert out["samples"] == want["samples"]


def test_reservoir_underrun_raises():
    g = _gran(pairs=[(1, 0)])
    blob = bytearray(encode_mp3([[[g], [g]]]))
    blob[4] = 0xFF  # main_data_begin way beyond the (empty) pool
    blob[5] |= 0x80
    with pytest.raises(ValueError, match="reservoir"):
        decode_mp3(bytes(blob))


def test_refusals_by_name():
    g = _gran(pairs=[(1, 0)])
    good = encode_mp3([[[g], [g]]])
    # MPEG-2 (LSF): version bits 10
    b = bytearray(good)
    b[1] = (b[1] & ~0x18) | 0x10
    with pytest.raises(NotImplementedError, match="MPEG-1 only"):
        decode_mp3(bytes(b))
    # Layer II: layer bits 10
    b = bytearray(good)
    b[1] = (b[1] & ~0x06) | 0x04
    with pytest.raises(NotImplementedError, match="Layer"):
        decode_mp3(bytes(b))
    # free-format bitrate
    b = bytearray(good)
    b[2] &= 0x0F
    with pytest.raises(ValueError, match="free-format"):
        decode_mp3(bytes(b))
    # intensity stereo (mode 01, mode_ext bit 0)
    ms = bytearray(encode_mp3([[[g, g], [g, g]]], mode=1, mode_ext=2))
    ms[3] = (ms[3] & ~0x30) | 0x10
    with pytest.raises(NotImplementedError, match="intensity"):
        decode_mp3(bytes(ms))
    # not an MPEG stream at all
    with pytest.raises(ValueError):
        decode_mp3(b"RIFFnope")


def test_unsupported_huffman_tables_refuse():
    g = _gran(pairs=[(1, 0)])
    blob = bytearray(encode_mp3([[[g], [g]]]))
    # side info granule 0 starts at byte 4+7 bits... flip table_select
    # region0 from 1 to 13 (a table outside the registry): the field
    # sits 12+9+8+4+1 = 34 bits into the granule, granule 0 starts at
    # bit 18+4*1 = 9+5+4 = 18 bits into side info (mono)
    bitpos = (4 * 8) + 18 + 34
    for i, bit in enumerate(f"{13:05b}"):
        byte, off = divmod(bitpos + i, 8)
        if bit == "1":
            blob[byte] |= 0x80 >> off
        else:
            blob[byte] &= ~(0x80 >> off)
    with pytest.raises(NotImplementedError, match="huffman table 13"):
        decode_mp3(bytes(blob))


def test_count1_table_a_refuses():
    g = _gran(quads=[(1, 0, 0, 1)])
    blob = bytearray(encode_mp3([[[g], [g]]]))
    # count1table_select is the last bit of the 59-bit granule info
    bitpos = (4 * 8) + 18 + 58
    byte, off = divmod(bitpos, 8)
    blob[byte] &= ~(0x80 >> off)
    with pytest.raises(NotImplementedError, match="count1 table A"):
        decode_mp3(bytes(blob))


def test_id3_prefix_and_decode_audio_dispatch():
    g = _gran(gg=200, pairs=[(1, 1)])
    blob = encode_mp3([[[g], [g]]])
    tag = b"ID3\x03\x00\x00\x00\x00\x00\x08payload!"
    out = multimodal.decode_audio(tag + blob)
    assert out["sample_rate"] == 44100
    assert out["n_samples"] == 1152
    assert out["bits"] == 16


def test_mp3_fingerprints_and_near_dup(spark):
    """The fingerprint/near-dup family now covers mp3: identical
    Layer III recordings under different ids band together."""
    g1 = _gran(gg=205, sfc=2, pairs=[(1, 1), (1, -1)],
               quads=[(1, 0, 0, 1)])
    g2 = _gran(gg=205, sfc=2, pairs=[(0, 1)], quads=[])
    loud = encode_mp3([[[g1], [g1]] for _ in range(2)])
    soft = encode_mp3([[[g2], [g2]] for _ in range(2)])
    rows = [(1, bytearray(loud)), (2, bytearray(loud)), (3, bytearray(soft))]
    media = spark.createDataFrame(rows, "doc_id long, blob binary")
    fp = multimodal.audio_fingerprint(media, n_frames=16, band_w=8)
    got = {r.doc_id: r.fp_hex for r in fp.collect()}
    assert got[1] is not None and got[1] == got[2]
    pairs = multimodal.fingerprint_near_dup(
        multimodal.audio_fingerprint(media, n_frames=16, band_w=8),
        max_hamming=0,
    )
    assert [(r.doc_a, r.doc_b) for r in pairs.collect()] == [(1, 2)]


def test_features_dead_letter_poison(spark):
    g = _gran(pairs=[(1, 0)])
    rows = [
        (1, bytearray(encode_mp3([[[g], [g]]]))),
        (2, bytearray(b"\xff\xfb garbage not a frame")),
        (3, bytearray(b"not audio at all")),
    ]
    media = spark.createDataFrame(rows, "doc_id long, blob binary")
    out = {r.doc_id: r for r in
           multimodal.mp3_audio_features(media).collect()}
    assert out[1].n_frames == 1 and out[1].nz_lines == 2
    assert out[2].n_frames is None
    assert out[3].n_frames is None


def test_mutation_fuzz_raises_cleanly():
    g = _gran(gg=180, sfc=7, pairs=[(1, -1), (1, 1)],
              quads=[(1, 0, 0, 1)])
    gs = _gran(gg=170, sfc=11, pairs=[(1, 0)], quads=[(0, 1, 1, 0)],
               bt=2)
    base = encode_mp3([[[g], [g]], [[gs], [gs]]])
    rng = random.Random(12)
    for _trial in range(300):
        b = bytearray(base)
        for _f in range(rng.randrange(1, 4)):
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        try:
            out = decode_mp3(bytes(b))
            assert len(out["samples"]) == out["n_samples"] * out["channels"]
        except (ValueError, NotImplementedError, IndexError, KeyError):
            pass


def test_vectorized_filterbank_matches_scalar_reference():
    """The numpy whole-granule filterbank (r12 optimization) must
    reproduce the retained scalar reference (_imdct_block, _Synth,
    _alias_reduce) on randomized spectra: same IMDCT/window/overlap
    arithmetic, same alias butterflies, same polyphase FIFO — the
    reassociation tolerance is float-epsilon only."""
    np = pytest.importorskip("numpy")
    from spotify_streaming_etl_pipeline_spark.llm.mp3 import (
        _CA,
        _CS,
        _Synth,
        _alias_reduce,
        _imdct_block,
        _np_tables,
    )

    npt = _np_tables()
    rng = random.Random(12)
    for bt in (0, 1, 3, 2):
        xr = [rng.uniform(-1, 1) for _ in range(576)]
        # scalar path
        ref = [x for x in xr]
        if bt != 2:
            _alias_reduce(ref)
        ref_z = [_imdct_block(ref[18 * sb : 18 * sb + 18], bt)
                 for sb in range(32)]
        # vectorized path (same slices decode_mp3 executes)
        x32 = np.asarray(xr).reshape(32, 18)
        if bt != 2:
            a8 = x32[:-1, 17:9:-1].copy()
            b8 = x32[1:, :8].copy()
            x32[:-1, 17:9:-1] = a8 * npt["CS"] - b8 * npt["CA"]
            x32[1:, :8] = b8 * npt["CS"] + a8 * npt["CA"]
        if bt == 2:
            z = np.zeros((32, 36))
            x3 = x32.reshape(32, 6, 3)
            for win in range(3):
                v12 = x3[:, :, win] @ npt["IM12T"]
                z[:, 6 + 6 * win : 18 + 6 * win] += v12 * npt["WS"]
        else:
            z = (x32 @ npt["IM36T"]) * npt["WIN"][bt]
        assert np.allclose(z, np.asarray(ref_z), atol=1e-12), bt

    # polyphase FIFO: 18 batched steps vs 18 scalar _Synth.step calls
    synth = _Synth()
    v0 = [rng.uniform(-1, 1) for _ in range(1024)]
    synth.v = list(v0)
    cur = np.asarray([[rng.uniform(-1, 1) for _ in range(18)]
                      for _ in range(32)])
    ref_out = []
    for t in range(18):
        s32 = [cur[sb, t] for sb in range(32)]
        ref_out.append(synth.step(s32))
    cols = npt["NMAT"] @ cur
    ext = np.concatenate((cols[:, ::-1].T.ravel(), np.asarray(v0)))
    idx = (17 - np.arange(18)) * 64
    vmat = np.lib.stride_tricks.sliding_window_view(ext, 1024)[idx]
    vmat = vmat.reshape(18, 8, 128)
    out = (vmat[:, :, :32] * npt["DWA"]).sum(1) + (
        vmat[:, :, 96:128] * npt["DWB"]
    ).sum(1)
    assert np.allclose(out, np.asarray(ref_out), atol=1e-12)
    assert np.allclose(ext[:1024], np.asarray(synth.v), atol=1e-12)
