"""Units for the FLAC codec (llm/flac.py): lossless
round-trips across subframe types, bit depths, and stereo
decorrelation modes; honest refusals; and the Spark feature stage's
dead-letter contract."""

from __future__ import annotations

import math

import pytest

from spotify_streaming_etl_pipeline_spark.llm import multimodal
from spotify_streaming_etl_pipeline_spark.llm.flac import (
    decode_flac,
    encode_flac,
)


def test_constant_subframe_roundtrip():
    out = decode_flac(encode_flac([[300] * 100], sample_rate=16000))
    assert out["samples"] == [300] * 100
    assert (out["sample_rate"], out["channels"], out["bits"]) == (16000, 1, 16)
    assert out["n_samples"] == 100


def test_fixed_orders_are_lossless():
    sig = [int(1000 * math.sin(i / 7) + 20 * i) for i in range(192)]
    for order in (0, 1, 2):
        dec = decode_flac(encode_flac([sig], fixed_order=order))
        assert dec["samples"] == sig, f"order {order}"


def test_verbatim_8bit_with_negatives():
    sig = [(-1) ** i * (i % 120) for i in range(64)]
    dec = decode_flac(encode_flac([sig], bits=8))
    assert dec["samples"] == sig and dec["bits"] == 8


def test_all_stereo_decorrelation_modes_lossless():
    left = [int(900 * math.sin(i / 5)) + 100 for i in range(96)]
    right = [int(700 * math.cos(i / 9)) - 50 for i in range(96)]
    want = [v for pair in zip(left, right) for v in pair]
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        dec = decode_flac(
            encode_flac([left, right], fixed_order=2, stereo_mode=mode)
        )
        assert dec["samples"] == want, mode
        assert dec["channels"] == 2


def test_lpc_subframes_are_lossless():
    """LPC decode (quantized coefficients + arithmetic-shift
    prediction) is exact for ANY coefficients — residuals encode
    whatever the predictor leaves — across orders and shifts."""
    sig = [int(1500 * math.sin(i / 6) + 9 * i) for i in range(200)]
    for coefs, shift, prec in ([[2], 1, 4], [[3, -1], 1, 5],
                               [[5, -4, 1], 2, 6], [[-1], 0, 4]):
        dec = decode_flac(encode_flac([sig], lpc=(coefs, shift, prec)))
        assert dec["samples"] == sig, (coefs, shift)
    left = sig[:100]
    right = [(-3 * x) // 2 for x in sig[:100]]
    dec = decode_flac(
        encode_flac([left, right], stereo_mode="mid_side", lpc=([3, -1], 1, 5))
    )
    assert dec["samples"] == [v for p in zip(left, right) for v in p]


def test_garbage_refuses_honestly():
    with pytest.raises(ValueError, match="stream marker"):
        decode_flac(b"not a flac stream")


def test_truncated_stream_raises_cleanly():
    blob = encode_flac([[int(20 * i) for i in range(100)]], fixed_order=1)
    with pytest.raises(ValueError):
        decode_flac(blob[: len(blob) - 30])


def test_sample_budget_stops_amplification_bomb():
    """A CONSTANT subframe encodes 65535 samples in ~6 bytes; the
    max_samples budget (decode-budget contract, r12) stops a poison
    stream before the sample list reaches GB scale."""
    blob = encode_flac([[7] * 4096] * 1, sample_rate=8000)
    assert decode_flac(blob)["n_samples"] == 4096
    with pytest.raises(ValueError, match="sample budget"):
        decode_flac(blob, max_samples=1000)


def test_mutation_fuzz_raises_cleanly():
    """Seeded mutation fuzz: corrupted FLAC bytes must raise ordinary
    data errors (the dead-letter contract), never hang or crash the
    interpreter — the same hygiene battery JPEG/PDF (r11) and
    WebP/mp3 (r12) carry."""
    import random

    rng = random.Random(4242)
    left = [int(900 * math.sin(i / 5)) + rng.randrange(40)
            for i in range(192)]
    right = [int(700 * math.cos(i / 9)) - rng.randrange(40)
             for i in range(192)]
    base = encode_flac([left, right], stereo_mode="mid_side",
                       lpc=([3, -1], 1, 5))
    for _ in range(200):
        b = bytearray(base)
        for _ in range(rng.randrange(1, 4)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            out = decode_flac(bytes(b))
            assert len(out["samples"]) == out["n_samples"] * out["channels"]
        except (ValueError, NotImplementedError, IndexError, KeyError):
            pass


def test_decode_audio_dispatch():
    """decode_audio routes by container magic: FLAC, WAV, and (since
    r12) MPEG-1 Layer III decode to the same dict shape; unknown
    containers refuse toward the pluggable stage."""
    flac_blob = encode_flac([[250] * 40], sample_rate=32000)
    out = multimodal.decode_audio(flac_blob)
    assert out["samples"] == [250] * 40 and out["sample_rate"] == 32000
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    wav = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 3) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", 3) + bytes([128, 138, 118]))
    assert multimodal.decode_audio(wav)["samples"] == [0, 10, -10]
    # mp3 bytes now route to llm/mp3.py; a tag with no frames is a
    # clean ValueError (dead-letter), not a task kill
    with pytest.raises(ValueError, match="no frame sync"):
        multimodal.decode_audio(b"ID3\x03\x00\x00\x00\x00\x00\x00")
    from spotify_streaming_etl_pipeline_spark.llm.mp3 import encode_mp3

    g = {"global_gain": 210, "scalefac_compress": 0, "big_pairs": [],
         "quads": [], "block_type": 0}
    mp3 = multimodal.decode_audio(encode_mp3([[[g], [g]]]))
    assert mp3["n_samples"] == 1152 and mp3["sample_rate"] == 44100
    with pytest.raises(NotImplementedError, match="ogg_stream_info"):
        multimodal.decode_audio(b"OggS vorbis-ish")
    with pytest.raises(NotImplementedError, match="container-agnostic"):
        multimodal.decode_audio(b"caff unknown-container")


def test_flac_features_dead_letters_poison(spark):
    docs = spark.createDataFrame([(0,), (1,)], "doc_id: long")
    media = multimodal.synth_flac_corpus(docs)
    poisoned = media.unionByName(
        spark.createDataFrame(
            [(99, bytearray(b"fLaCgarbage"))], "doc_id: long, blob: binary"
        )
    )
    got = {
        r["doc_id"]: (r["rms"], r["sample_rate"])
        for r in multimodal.flac_features(poisoned).collect()
    }
    assert got[99] == (None, None)
    assert got[0] == (50, 8000)  # amp 50, rate 8000
    assert got[1] == (51, 16000)  # amp 51, rate 16000


def test_all_sample_depths_roundtrip():
    """The subframe math is depth-agnostic; 12/20/24-bit streams (the
    frame-header sample-size codes beyond 8/16) round-trip exactly,
    including LPC and side-channel (bits+1) paths."""
    sig24 = [int(4_000_000 * math.sin(i / 6)) + 1000 * i for i in range(150)]
    for bits, sig in ((12, [int(1800 * math.sin(i / 5)) for i in range(100)]),
                      (20, [int(400_000 * math.sin(i / 7)) for i in range(100)]),
                      (24, sig24)):
        dec = decode_flac(encode_flac([sig], bits=bits, fixed_order=2))
        assert dec["samples"] == sig and dec["bits"] == bits
    dec = decode_flac(encode_flac([sig24], bits=24, lpc=([3, -1], 1, 5)))
    assert dec["samples"] == sig24
    left, right = sig24[:80], [x // 3 for x in sig24[:80]]
    dec = decode_flac(
        encode_flac([left, right], bits=24, stereo_mode="left_side",
                    fixed_order=1)
    )
    assert dec["samples"] == [v for p in zip(left, right) for v in p]
    # 32-bit: the full advertised depth range round-trips (ss code 7)
    sig32 = [int(9e8 * math.sin(i / 6)) for i in range(64)]
    dec32 = decode_flac(encode_flac([sig32], bits=32, fixed_order=2))
    assert dec32["samples"] == sig32 and dec32["bits"] == 32


def test_frame_sample_size_code_is_decoded_and_checked():
    """The frame header's 3-bit sample-size code is decoded, not
    ignored: a frame whose code contradicts STREAMINFO is a hard
    ValueError (silently trusting STREAMINFO would mis-scale every
    sample); an unsupported encoder depth is a ValueError, never a
    bare KeyError."""
    blob = bytearray(encode_flac([[300] * 100], bits=16))
    # frame starts right after 4-byte marker + 4-byte block header +
    # 34-byte STREAMINFO; the ss code is bits 20-22 of the 4-byte
    # frame header (after 14 sync + 2 reserved/strategy + 4 bs + 4 sr
    # + 4 ch): byte 3 of the frame, bits 3-1.
    fpos = 4 + 4 + 34
    b3 = blob[fpos + 3]
    assert (b3 >> 1) & 7 == 4  # encoder wrote code 4 = 16-bit
    blob[fpos + 3] = (b3 & ~0x0E) | (1 << 1)  # code 1 = 8-bit
    with pytest.raises(ValueError, match="contradicts"):
        decode_flac(bytes(blob))
    blob[fpos + 3] = (b3 & ~0x0E) | (3 << 1)  # code 3 = reserved
    with pytest.raises(ValueError, match="reserved"):
        decode_flac(bytes(blob))
    with pytest.raises(ValueError, match="unsupported"):
        encode_flac([[1, 2, 3]], bits=10)
