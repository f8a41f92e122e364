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


def test_pigeonhole_slicing_bounds(spark):
    ah = multimodal.image_ahash(
        _media(spark, [(1, multimodal.encode_png(8, 8, 1, bytes(64)))])
    )
    # bit-sliced banding supports any threshold below the bit width…
    assert multimodal.ahash_near_dup(ah, max_hamming=8).count() == 0
    # …but not at/over it (t + 1 bands need t + 1 <= 64 bits)
    with pytest.raises(ValueError, match="pigeonhole"):
        multimodal.ahash_near_dup(ah, max_hamming=64).collect()


def test_star_guard_degrades_giant_buckets_to_rep_edges(spark):
    # five identical images: every band bucket has size 5 > cap 2,
    # so the guard emits only (min, member) star edges — 4 pairs,
    # not the 10 all-pairs — preserving cluster connectivity
    base = bytes((200 if x >= 4 else 0) for _ in range(8) for x in range(8))
    media = _media(
        spark, [(i, multimodal.encode_png(8, 8, 1, base)) for i in range(5)]
    )
    ah = multimodal.image_ahash(media)
    pairs = {
        (r.doc_a, r.doc_b)
        for r in multimodal.ahash_near_dup(
            ah, max_hamming=4, max_bucket_size=2
        ).collect()
    }
    assert pairs == {(0, 1), (0, 2), (0, 3), (0, 4)}
    # guard off (or roomy): full all-pairs
    full = multimodal.ahash_near_dup(ah, max_hamming=4, max_bucket_size=None)
    assert full.count() == 10


def test_hash_w_guard(spark):
    with pytest.raises(ValueError, match="band byte"):
        multimodal.image_ahash(_media(spark, []), hash_w=9)


def test_audio_fingerprint_known_profile(spark):
    """Quiet first half, loud second half -> bands 0,0,0,0,255,255,255,255."""
    import struct

    samples = [10 if i < 800 else 100 for i in range(1600)]
    data = bytes(s + 128 for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    blob = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    row = multimodal.audio_fingerprint(
        _media(spark, [(1, blob)])
    ).collect()[0]
    assert row.bands == [0, 0, 0, 0, 255, 255, 255, 255]
    assert row.fp_hex == "00000000ffffffff"


def test_audio_fingerprint_level_shift_invariance(spark):
    """Scaling every sample by an integer k <= 64 scales frame
    energies AND the mean together -> identical fingerprint (the
    aHash property on the time axis).  Amplitudes are constant
    WITHIN each frame so the frame energy is exact and the integer
    floor argument holds (varying intra-frame samples would add
    floor noise the invariance claim doesn't cover)."""
    import struct

    def blob(scale):
        amps = [((f * 37) % 90 + 10) * scale for f in range(64)]
        samples = [
            amps[i // 25] * (1 if i % 2 == 0 else -1) for i in range(1600)
        ]
        data = struct.pack(f"<{len(samples)}h", *samples)
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        chunks = (
            b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    rows = multimodal.audio_fingerprint(
        _media(spark, [(1, blob(1)), (2, blob(3))])
    ).collect()
    got = {r.doc_id: r.fp_hex for r in rows}
    assert got[1] == got[2]


def test_wide_fingerprint_banding_matches_brute_force(spark):
    """128-bit fingerprints (the audio scale path: wider fingerprints
    keep band keys ~18 bits at t=6, where 64-bit keys are ~9 bits and
    saturate around ~50k distinct fingerprints) band through the
    multi-word struct path and must equal brute force exactly."""
    import itertools
    import random

    rng = random.Random(7)
    base = [rng.randrange(256) for _ in range(16)]

    def flip(b, k):
        out = list(b)
        for bit in rng.sample(range(128), k):
            out[bit // 8] ^= 1 << (bit % 8)
        return out

    other = [rng.randrange(256) for _ in range(16)]
    rows = [
        (0, base), (1, list(base)), (2, flip(base, 3)),
        (3, flip(base, 6)), (4, flip(base, 40)),
        (5, other), (6, flip(other, 5)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, bands array<int>")
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in multimodal.fingerprint_near_dup(df, max_hamming=6).collect()
    }

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    by_id = dict(rows)
    exp = {
        (a, b, ham(by_id[a], by_id[b]))
        for a, b in itertools.combinations(range(7), 2)
        if ham(by_id[a], by_id[b]) <= 6
    }
    assert got == exp


def test_audio_fingerprint_flac_matches_wav(spark):
    """A FLAC and a WAV of the SAME samples fingerprint identically
    (the decode_audio dispatch — a WAV-only decode would null the
    FLAC row), and the mixed-container substrate pairs them at
    hamming 0."""
    import struct

    from spotify_streaming_etl_pipeline_spark.llm.flac import encode_flac
    from spotify_streaming_etl_pipeline_spark.llm.multimodal import (
        _tone_samples,
    )

    samples = _tone_samples(5, 13)
    data = bytes(s + 128 for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    wav = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    flac = encode_flac([samples], sample_rate=8000, fixed_order=1)
    fps = multimodal.audio_fingerprint(
        _media(spark, [(1, wav), (2, flac)])
    )
    got = {r.doc_id: r.fp_hex for r in fps.collect()}
    assert got[1] is not None and got[1] == got[2]
    pairs = multimodal.fingerprint_near_dup(fps, max_hamming=6).collect()
    assert [(p.doc_a, p.doc_b, p.hamming) for p in pairs] == [(1, 2, 0)]


def test_audio_fingerprint_poison_and_guards(spark):
    rows = multimodal.audio_fingerprint(
        _media(spark, [(1, b"not a wav at all")])
    ).collect()
    assert rows[0].bands is None
    import pytest as _pytest

    with _pytest.raises(ValueError, match="band byte"):
        multimodal.audio_fingerprint(_media(spark, []), band_w=9)
    with _pytest.raises(ValueError, match="multiple"):
        multimodal.audio_fingerprint(_media(spark, []), n_frames=63)


def test_video_near_dup_cross_container_and_reorder(spark):
    """An AVI and an mp4 with the same frames match at jaccard 1.0;
    frame ORDER does not matter (set semantics); repeated frames
    within one video count once; poison blobs drop."""
    import struct

    def avi(frames):
        movi = b"movi"
        for f in frames:
            movi += b"00dc" + struct.pack("<I", len(f)) + f + (
                b"\x00" if len(f) & 1 else b""
            )
        body = b"AVI LIST" + struct.pack("<I", 4) + b"hdrl"
        body += b"LIST" + struct.pack("<I", len(movi)) + movi
        return b"RIFF" + struct.pack("<I", len(body)) + body

    f1, f2, f3 = b"frame-one!", b"frame-two!", b"frame-three"
    media = spark.createDataFrame(
        [
            (1, avi([f1, f2, f3])),
            (2, avi([f3, f1, f2])),        # reordered -> still 1.0
            (3, avi([f1, f1, f2, f2])),    # dup frames collapse -> 2/3
            (4, b"not a container"),       # poison -> contributes nothing
        ],
        "doc_id long, blob binary",
    )
    from spotify_streaming_etl_pipeline_spark.llm.multimodal import (
        video_near_dup,
    )

    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in video_near_dup(media, threshold=0.3).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert pairs[(1, 3)] == round(2 / 3, 4)
    assert not any(4 in p for p in pairs)
