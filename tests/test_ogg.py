"""Units for the Ogg container walk (llm/multimodal.py:
ogg_stream_info): RFC 3533 page layout, Opus/Vorbis BOS
identification, granule-position duration math, lacing spans,
honest refusals, the dead-letter Spark stage, and the seeded
mutation-fuzz battery."""

from __future__ import annotations

import random

import pytest

from spotify_streaming_etl_pipeline_spark.llm import multimodal
from spotify_streaming_etl_pipeline_spark.llm.multimodal import (
    _ogg_crc,
    ogg_stream_info,
)


def _page(serial, seq, granule, body, htype=0):
    head = (b"OggS" + bytes([0, htype])
            + granule.to_bytes(8, "little", signed=True)
            + serial.to_bytes(4, "little")
            + seq.to_bytes(4, "little")
            + b"\x00\x00\x00\x00"
            + bytes([len(body) // 255 + 1])
            + b"\xff" * (len(body) // 255)
            + bytes([len(body) % 255]))
    img = head + body
    return img[:22] + _ogg_crc(img).to_bytes(4, "little") + img[26:]


def _opus_head(channels=2, pre_skip=312):
    return (b"OpusHead" + bytes([1, channels])
            + pre_skip.to_bytes(2, "little")
            + (48000).to_bytes(4, "little") + b"\x00\x00\x00")


def _vorbis_id(channels=2, rate=44100):
    return (b"\x01vorbis" + (0).to_bytes(4, "little") + bytes([channels])
            + rate.to_bytes(4, "little") + b"\x00" * 12 + b"\xb8\x01")


def test_opus_walk_subtracts_preskip():
    s = 7
    blob = (_page(s, 0, 0, _opus_head(channels=1, pre_skip=312), 0x02)
            + _page(s, 1, 312 + 960, b"\x01" * 50)
            + _page(s, 2, 312 + 2880, b"\x02" * 50, 0x04))
    out = ogg_stream_info(blob)
    assert out == {"codec": "opus", "n_pages": 3, "channels": 1,
                   "sample_rate": 48000,
                   "duration_ms": 2880 * 1000 // 48000, "serial": 7}


def test_vorbis_walk_uses_declared_rate():
    s = 9
    blob = (_page(s, 0, 0, _vorbis_id(channels=2, rate=32000), 0x02)
            + _page(s, 1, 16000, b"\x03" * 400, 0x04))
    out = ogg_stream_info(blob)
    assert (out["codec"], out["sample_rate"], out["duration_ms"]) == (
        "vorbis", 32000, 500)


def test_long_lacing_span_and_negative_granule():
    # a 600-byte body needs a 255,255,90 lacing run; a -1 granule
    # (no packet finishes on the page) must not move the duration
    s = 3
    blob = (_page(s, 0, 0, _vorbis_id(rate=48000), 0x02)
            + _page(s, 1, -1, b"\x04" * 600)
            + _page(s, 2, 4800, b"\x05" * 10, 0x04))
    out = ogg_stream_info(blob)
    assert out["n_pages"] == 3 and out["duration_ms"] == 100


def test_refusals_by_name():
    s = 5
    with pytest.raises(ValueError, match="bad capture"):
        ogg_stream_info(b"not ogg at all, not even close")
    with pytest.raises(NotImplementedError, match="version"):
        bad = bytearray(_page(s, 0, 0, _opus_head(), 0x02))
        bad[4] = 1
        ogg_stream_info(bytes(bad))
    with pytest.raises(NotImplementedError, match="multiplexed"):
        ogg_stream_info(_page(1, 0, 0, _opus_head(), 0x02)
                        + _page(2, 0, 960, b"x" * 5, 0x02))
    with pytest.raises(NotImplementedError, match="chained"):
        ogg_stream_info(_page(s, 0, 0, _opus_head(), 0x02)
                        + _page(s, 1, 960, _opus_head(), 0x02))
    with pytest.raises(NotImplementedError, match="theora"):
        ogg_stream_info(_page(s, 0, 0, b"\x80theora junk", 0x02))
    with pytest.raises(ValueError, match="truncated Ogg page body"):
        ogg_stream_info(_page(s, 0, 0, _opus_head(), 0x02)[:-3])
    with pytest.raises(ValueError, match="no BOS"):
        ogg_stream_info(_page(s, 0, 960, b"\x06" * 4, 0x04))


def test_decode_audio_refuses_ogg_by_name():
    blob = _page(1, 0, 0, _opus_head(), 0x02)
    with pytest.raises(NotImplementedError, match="ogg_stream_info"):
        multimodal.decode_audio(blob)


def test_mutation_fuzz_raises_cleanly():
    rng = random.Random(31337)
    s = 11
    base = (_page(s, 0, 0, _opus_head(), 0x02)
            + _page(s, 1, 312 + 960, b"\x01" * 300)
            + _page(s, 2, 312 + 1920, b"\x02" * 30, 0x04))
    for _ in range(300):
        b = bytearray(base)
        for _ in range(rng.randrange(1, 4)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            out = ogg_stream_info(bytes(b))
            assert out["n_pages"] >= 1
        except (ValueError, NotImplementedError, IndexError, KeyError):
            pass


def test_ogg_features_dead_letters_poison(spark):
    docs = spark.createDataFrame([(0,), (1,)], "doc_id: long")
    media = multimodal.synth_ogg_corpus(docs)
    poisoned = media.unionByName(
        spark.createDataFrame(
            [(99, bytearray(b"OggS\x00garbage-page"))],
            "doc_id: long, blob: binary",
        )
    )
    got = {r["doc_id"]: (r["codec"], r["duration_ms"])
           for r in multimodal.ogg_features(poisoned).collect()}
    assert got[99] == (None, None)
    assert got[0][0] == "opus" and got[1][0] == "vorbis"
