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
