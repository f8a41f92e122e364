"""Units for the pure-stdlib AES core (llm/aes.py): FIPS-197 appendix
vectors (the S-box and tables are DERIVED from the GF(2^8) algebra,
so the official vectors are the proof they came out right), CBC
round-trips, and loud failure on corrupt input."""

from __future__ import annotations

import pytest

from spotify_streaming_etl_pipeline_spark.llm.aes import (
    _decrypt_block,
    _encrypt_block,
    _expand_key,
    aes_cbc_decrypt,
    aes_cbc_encrypt,
    aes_cbc_nopad,
)

PT = bytes.fromhex("00112233445566778899aabbccddeeff")


def test_fips197_appendix_c_vectors():
    k128 = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    k192 = bytes.fromhex(
        "000102030405060708090a0b0c0d0e0f1011121314151617"
    )
    k256 = bytes.fromhex(
        "000102030405060708090a0b0c0d0e0f"
        "101112131415161718191a1b1c1d1e1f"
    )
    for key, want in (
        (k128, "69c4e0d86a7b0430d8cdb78070b4c55a"),  # C.1
        (k192, "dda97ca4864cdfe06eaf70a0ec0d7191"),  # C.2
        (k256, "8ea2b7ca516745bfeafc49904b496089"),  # C.3
    ):
        rks = _expand_key(key)
        ct = _encrypt_block(PT, rks)
        assert ct == bytes.fromhex(want), ct.hex()
        assert _decrypt_block(ct, rks) == PT


def test_cbc_roundtrip_and_padding():
    key = bytes(range(32))
    iv = bytes(range(100, 116))
    for n in (0, 1, 15, 16, 17, 255):
        data = bytes((i * 13) % 256 for i in range(n))
        ct = aes_cbc_encrypt(key, iv, data)
        assert len(ct) % 16 == 0 and len(ct) > len(data)
        assert aes_cbc_decrypt(key, iv, ct) == data
    # wrong key fails the padding check loudly
    ct = aes_cbc_encrypt(key, iv, b"hello world")
    with pytest.raises(ValueError):
        aes_cbc_decrypt(bytes(32), iv, ct)
    with pytest.raises(ValueError, match="block-aligned"):
        aes_cbc_decrypt(key, iv, ct[:-3])


def test_nopad_cbc_and_key_sizes():
    key = bytes(range(16))
    data = b"A" * 48
    ct = aes_cbc_nopad(key, bytes(16), data, encrypt=True)
    assert aes_cbc_nopad(key, bytes(16), ct, encrypt=False) == data
    with pytest.raises(ValueError, match="key"):
        _expand_key(b"short")


def test_evp_and_pure_engines_agree():
    """r12 optimization: the OpenSSL-EVP fast path must be
    byte-identical to the pure-Python FIPS-197 engine on every key
    size, data length, and direction (padding logic is shared, so
    cross-checking the unpadded core covers both public forms)."""
    import random

    from spotify_streaming_etl_pipeline_spark.llm import aes

    rnd = random.Random(1234)
    for klen in (16, 24, 32):
        for nblocks in (1, 2, 7, 65):
            key = bytes(rnd.randrange(256) for _ in range(klen))
            iv = bytes(rnd.randrange(256) for _ in range(16))
            data = bytes(rnd.randrange(256) for _ in range(16 * nblocks))
            ct_pure = aes._pure_cbc(key, iv, data, True)
            assert aes.aes_cbc_nopad(key, iv, data, True) == ct_pure
            assert aes._pure_cbc(key, iv, ct_pure, False) == data
            assert aes.aes_cbc_nopad(key, iv, ct_pure, False) == data


def test_pure_fallback_forced_by_env(tmp_path):
    """SPARK_GRAFT_PURE_AES=1 must disable the EVP engine and leave
    results unchanged (the degraded-environment posture)."""
    import subprocess
    import sys

    code = (
        "from spotify_streaming_etl_pipeline_spark.llm import aes\n"
        "assert aes._EVP_CBC is None\n"
        "ct = aes.aes_cbc_encrypt(b'k'*16, b'i'*16, b'payload')\n"
        "assert aes.aes_cbc_decrypt(b'k'*16, b'i'*16, ct) == b'payload'\n"
        "print(ct.hex())\n"
    )
    env = {"SPARK_GRAFT_PURE_AES": "1", "PATH": "/usr/bin:/bin"}
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env=env,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    from spotify_streaming_etl_pipeline_spark.llm import aes

    assert (
        aes.aes_cbc_encrypt(b"k" * 16, b"i" * 16, b"payload").hex()
        == out.stdout.strip()
    )
