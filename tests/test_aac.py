"""Units for the ADTS AAC header walk (llm/multimodal.py:
aac_stream_info): header-field bit layout, CRC/multi-block forms,
ID3 skip, honest refusals, the dead-letter Spark stage, and the
seeded mutation-fuzz crash-hygiene battery."""

from __future__ import annotations

import random

import pytest

from spotify_streaming_etl_pipeline_spark.llm import multimodal
from spotify_streaming_etl_pipeline_spark.llm.multimodal import (
    aac_stream_info,
)


def _adts_frame(profile=1, sfi=4, ch=2, payload=10, crc=False, rdb=0):
    header_len = 9 if crc else 7
    flen = header_len + payload
    hdr = bytes([
        0xFF,
        0xF0 | (0 if crc else 1),
        (profile << 6) | (sfi << 2) | (ch >> 2),
        ((ch & 3) << 6) | (flen >> 11),
        (flen >> 3) & 0xFF,
        ((flen & 7) << 5) | 0x1F,
        (0x3F << 2) | rdb,
    ])
    return hdr + (b"\x00\x00" if crc else b"") + b"\x00" * payload


def test_walk_and_field_layout():
    blob = b"".join(_adts_frame(profile=2, sfi=3, ch=6, payload=p)
                    for p in (5, 9, 13))
    out = aac_stream_info(blob)
    assert out == {
        "n_frames": 3, "sample_rate": 48000, "channels": 6,
        "profile": 2, "duration_ms": 3 * 1024 * 1000 // 48000,
        "crc_frames": 0,
    }


def test_crc_and_raw_data_blocks():
    blob = (_adts_frame(crc=True, rdb=1, payload=20)
            + _adts_frame(crc=False, rdb=0, payload=4))
    out = aac_stream_info(blob)
    assert out["crc_frames"] == 1 and out["n_frames"] == 2
    assert out["duration_ms"] == 3 * 1024 * 1000 // 44100


def test_id3_prefix_and_trailing_tag():
    body = _adts_frame(sfi=8, ch=1)
    tagged = (b"ID3\x03\x00\x00" + bytes([0, 0, 0, 4]) + b"beef"
              + body + b"TAG" + b"\x00" * 125)
    out = aac_stream_info(tagged)
    assert out["sample_rate"] == 16000 and out["n_frames"] == 1


def test_refusals_by_name():
    with pytest.raises(NotImplementedError, match="LOAS"):
        aac_stream_info(b"\x56\xe0\x12\x34\x56\x78\x9a")
    with pytest.raises(NotImplementedError, match="ADTS"):
        aac_stream_info(b"ADIF" + b"\x00" * 16)
    with pytest.raises(NotImplementedError, match="escape"):
        aac_stream_info(_adts_frame(sfi=15))
    with pytest.raises(ValueError, match="reserved"):
        aac_stream_info(_adts_frame(sfi=13))
    with pytest.raises(NotImplementedError, match="PCE"):
        aac_stream_info(_adts_frame(ch=0))
    with pytest.raises(ValueError, match="truncated"):
        aac_stream_info(_adts_frame(payload=30)[:-10])
    with pytest.raises(ValueError, match="no frame sync"):
        aac_stream_info(b"not audio at all")
    # layer bits must be 00
    bad = bytearray(_adts_frame())
    bad[1] |= 0x06
    with pytest.raises(ValueError, match="layer"):
        aac_stream_info(bytes(bad))


def test_mid_stream_changes_rejected():
    blob = _adts_frame(sfi=4) + _adts_frame(sfi=3)
    with pytest.raises(ValueError, match="mid-stream"):
        aac_stream_info(blob)


def test_mutation_fuzz_raises_cleanly():
    rng = random.Random(777)
    base = b"".join(_adts_frame(profile=k % 4, sfi=4, ch=2, crc=k % 2 == 0,
                                payload=8 + k) for k in range(4))
    for _ in range(300):
        b = bytearray(base)
        for _ in range(rng.randrange(1, 4)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            out = aac_stream_info(bytes(b))
            assert out["n_frames"] >= 1
        except (ValueError, NotImplementedError, IndexError, KeyError):
            pass


def test_decode_audio_refuses_adts_by_name():
    with pytest.raises(NotImplementedError, match="ADTS AAC"):
        multimodal.decode_audio(_adts_frame())


def test_aac_features_dead_letters_poison(spark):
    docs = spark.createDataFrame([(0,), (3,)], "doc_id: long")
    media = multimodal.synth_aac_corpus(docs)
    poisoned = media.unionByName(
        spark.createDataFrame(
            [(99, bytearray(b"\xff\xf1garbage"))], "doc_id: long, blob: binary"
        )
    )
    got = {r["doc_id"]: r["n_frames"]
           for r in multimodal.aac_features(poisoned).collect()}
    assert got[99] is None and got[0] == 2 and got[3] == 5
