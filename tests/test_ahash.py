"""Units for the image aHash family (llm/multimodal.py): channel
collapse, poison-blob dead-lettering, the pigeonhole guard, and
hamming arithmetic on crafted fingerprints."""

from __future__ import annotations

import pytest

from spotify_streaming_etl_pipeline_spark.llm import multimodal


def _media(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, blob binary")


def test_ahash_known_image(spark):
    # 8x8 image, left half 0, right half 200: mean = 100, bits set on
    # the right 4 columns of every row -> each band = 0b11110000 = 240
    px = bytes((200 if x >= 4 else 0) for _ in range(8) for x in range(8))
    blob = multimodal.encode_png(8, 8, 1, px)
    row = multimodal.image_ahash(_media(spark, [(1, blob)])).collect()[0]
    assert row.bands == [240] * 8
    assert row.ahash_hex == "f0" * 8


def test_ahash_multichannel_luma_collapse(spark):
    # 2-channel image whose per-sample channel MEAN reproduces the
    # same left/right split -> identical hash to the grayscale case
    px = bytearray()
    for _ in range(8):
        for x in range(8):
            v = 200 if x >= 4 else 0
            px += bytes([v, v])
    blob = multimodal.encode_png(8, 8, 2, bytes(px))
    row = multimodal.image_ahash(_media(spark, [(1, blob)])).collect()[0]
    assert row.bands == [240] * 8


def test_ahash_poison_blob_yields_null_not_task_kill(spark):
    good = multimodal.encode_png(8, 8, 1, bytes(range(64)))
    rows = multimodal.image_ahash(
        _media(spark, [(1, good), (2, b"\x00garbage")])
    ).collect()
    got = {r.doc_id: r.bands for r in rows}
    assert got[1] is not None and got[2] is None


def test_near_dup_exact_and_near(spark):
    base = bytes((200 if x >= 4 else 0) for _ in range(8) for x in range(8))
    # flip one sample in the thresholded region -> 1-bit hamming
    near = bytearray(base)
    near[0] = 255
    media = _media(
        spark,
        [
            (1, multimodal.encode_png(8, 8, 1, base)),
            (2, multimodal.encode_png(8, 8, 1, base)),
            (3, multimodal.encode_png(8, 8, 1, bytes(near))),
        ],
    )
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in multimodal.ahash_near_dup(
            multimodal.image_ahash(media), max_hamming=4
        ).collect()
    }
    assert pairs[(1, 2)] == 0
    assert pairs[(1, 3)] == 1
    assert pairs[(2, 3)] == 1


def test_pigeonhole_guard_rejects_too_wide_threshold(spark):
    ah = multimodal.image_ahash(
        _media(spark, [(1, multimodal.encode_png(8, 8, 1, bytes(64)))])
    )
    with pytest.raises(ValueError, match="pigeonhole"):
        multimodal.ahash_near_dup(ah, max_hamming=8).collect()


def test_hash_w_guard(spark):
    with pytest.raises(ValueError, match="band byte"):
        multimodal.image_ahash(_media(spark, []), hash_w=9)
