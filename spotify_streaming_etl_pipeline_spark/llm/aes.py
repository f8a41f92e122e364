"""Stdlib-only AES (FIPS-197) — the cipher the PDF standard security
handler needs for /AESV2 (AES-128-CBC, PDF 1.6+) and /AESV3
(AES-256-CBC, PDF 2.0) document decryption (llm/pdf.py).

Two engines behind one API:

- **OpenSSL EVP via ctypes** (the r12 optimization-round fast path):
  ``hashlib`` already rides the same libcrypto, and ctypes is stdlib,
  so this adds no dependency.  The PDF 2.0 revision-6 KDF (ISO
  32000-2 Algorithm 2.B) pushes ~8k CBC blocks per derivation through
  this module; pure-Python T-tables ran it at ~7 µs/block, which made
  the 12 AES-256 documents of the pdf oracle substrate cost ~4.6 s of
  a 7.5 s query (measured, OPTIMIZATION_r12.md).  The EVP path is
  verified against the pure implementation on a FIPS-197 vector at
  load and falls back silently if libcrypto is unavailable;
  ``SPARK_GRAFT_PURE_AES=1`` forces the pure path (used by the parity
  test).
- **Pure-Python fallback**, everything DERIVED from the spec's
  algebra rather than pasted tables: the S-box is the GF(2^8)
  multiplicative inverse (modulo the AES polynomial x^8+x^4+x^3+x+1)
  followed by the affine transform
  b ^ rot1(b) ^ rot2(b) ^ rot3(b) ^ rot4(b) ^ 0x63, computed at
  import; MixColumns uses xtime chains.

Padding (PKCS#7) stays in Python on BOTH engines, so the
dead-letter contract (ValueError on corrupt padding) is engine
-independent.

Used by: llm/pdf.py (_crypt_setup AESV2/AESV3 paths, the encrypting
writer substrate).  Reference parity note: the reference pipeline has
no document or crypto surface (BASELINE.md); additive LLM-curation
support code.
"""

from __future__ import annotations

import os

__all__ = ["aes_cbc_decrypt", "aes_cbc_encrypt", "aes_cbc_nopad"]


def _gf_mul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return p


def _build_sbox() -> tuple[bytes, bytes]:
    # multiplicative inverses via brute pairing (256 elements)
    inv = [0] * 256
    for x in range(1, 256):
        for y in range(1, 256):
            if _gf_mul(x, y) == 1:
                inv[x] = y
                break
    sbox = [0] * 256
    for x in range(256):
        b = inv[x]
        s = b
        for r in (1, 2, 3, 4):
            s ^= ((b << r) | (b >> (8 - r))) & 0xFF
        sbox[x] = s ^ 0x63
    invbox = [0] * 256
    for x, s in enumerate(sbox):
        invbox[s] = x
    return bytes(sbox), bytes(invbox)


_SBOX, _INV_SBOX = _build_sbox()


def _expand_key(key: bytes) -> list[bytes]:
    """Round keys (Nr+1 x 16 bytes) for AES-128/192/256."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise ValueError("AES key must be 16, 24, or 32 bytes")
    nr = nk + 6
    words = [key[4 * i : 4 * i + 4] for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = words[i - 1]
        if i % nk == 0:
            t = bytes(_SBOX[b] for b in t[1:] + t[:1])
            t = bytes([t[0] ^ rcon]) + t[1:]
            rcon = _gf_mul(rcon, 2)
        elif nk == 8 and i % nk == 4:
            t = bytes(_SBOX[b] for b in t)
        words.append(bytes(a ^ b for a, b in zip(words[i - nk], t)))
    return [
        b"".join(words[4 * r : 4 * r + 4]) for r in range(nr + 1)
    ]


# T-tables (column-wise round lookups, the classic software AES): one
# 32-bit word per S-box output packing the MixColumns products — the
# PDF 2.0 revision-6 KDF pushes tens of thousands of blocks through
# here, so the per-byte GF multiplies must be table lookups.
def _pack(a: int, b: int, c: int, d: int) -> int:
    return (a << 24) | (b << 16) | (c << 8) | d


_TE = [
    [
        _pack(
            _gf_mul(_SBOX[x], m0),
            _gf_mul(_SBOX[x], m1),
            _gf_mul(_SBOX[x], m2),
            _gf_mul(_SBOX[x], m3),
        )
        for x in range(256)
    ]
    for m0, m1, m2, m3 in (
        (2, 1, 1, 3), (3, 2, 1, 1), (1, 3, 2, 1), (1, 1, 3, 2)
    )
]
_TD = [
    [
        _pack(
            _gf_mul(_INV_SBOX[x], m0),
            _gf_mul(_INV_SBOX[x], m1),
            _gf_mul(_INV_SBOX[x], m2),
            _gf_mul(_INV_SBOX[x], m3),
        )
        for x in range(256)
    ]
    for m0, m1, m2, m3 in (
        (14, 9, 13, 11), (11, 14, 9, 13), (13, 11, 14, 9), (9, 13, 11, 14)
    )
]


def _words(b: bytes) -> tuple[int, int, int, int]:
    return (
        int.from_bytes(b[0:4], "big"),
        int.from_bytes(b[4:8], "big"),
        int.from_bytes(b[8:12], "big"),
        int.from_bytes(b[12:16], "big"),
    )


def _encrypt_block(block: bytes, rks: list[bytes]) -> bytes:
    te0, te1, te2, te3 = _TE
    k = _words(rks[0])
    s0, s1, s2, s3 = (w ^ kw for w, kw in zip(_words(block), k))
    for rnd in range(1, len(rks) - 1):
        k = _words(rks[rnd])
        t0 = (
            te0[s0 >> 24] ^ te1[(s1 >> 16) & 0xFF]
            ^ te2[(s2 >> 8) & 0xFF] ^ te3[s3 & 0xFF] ^ k[0]
        )
        t1 = (
            te0[s1 >> 24] ^ te1[(s2 >> 16) & 0xFF]
            ^ te2[(s3 >> 8) & 0xFF] ^ te3[s0 & 0xFF] ^ k[1]
        )
        t2 = (
            te0[s2 >> 24] ^ te1[(s3 >> 16) & 0xFF]
            ^ te2[(s0 >> 8) & 0xFF] ^ te3[s1 & 0xFF] ^ k[2]
        )
        t3 = (
            te0[s3 >> 24] ^ te1[(s0 >> 16) & 0xFF]
            ^ te2[(s1 >> 8) & 0xFF] ^ te3[s2 & 0xFF] ^ k[3]
        )
        s0, s1, s2, s3 = t0, t1, t2, t3
    k = _words(rks[-1])
    sb = _SBOX
    out = bytearray(16)
    for i, (a, b, c, d, kw) in enumerate(
        (
            (s0, s1, s2, s3, k[0]),
            (s1, s2, s3, s0, k[1]),
            (s2, s3, s0, s1, k[2]),
            (s3, s0, s1, s2, k[3]),
        )
    ):
        w = (
            (sb[a >> 24] << 24) | (sb[(b >> 16) & 0xFF] << 16)
            | (sb[(c >> 8) & 0xFF] << 8) | sb[d & 0xFF]
        ) ^ kw
        out[4 * i : 4 * i + 4] = w.to_bytes(4, "big")
    return bytes(out)


def _decrypt_block(block: bytes, rks: list[bytes]) -> bytes:
    td0, td1, td2, td3 = _TD
    k = _words(rks[-1])
    s0, s1, s2, s3 = (w ^ kw for w, kw in zip(_words(block), k))
    for rnd in range(len(rks) - 2, 0, -1):
        k = _words(rks[rnd])
        # the equivalent inverse cipher: InvMixColumns is linear, so
        # the straight order (shift, sub, addkey, invmix) folds into
        # one TD lookup with InvMixColumns applied to the round key
        ik = tuple(_inv_mix_word(kw) for kw in k)
        t0 = (
            td0[s0 >> 24] ^ td1[(s3 >> 16) & 0xFF]
            ^ td2[(s2 >> 8) & 0xFF] ^ td3[s1 & 0xFF] ^ ik[0]
        )
        t1 = (
            td0[s1 >> 24] ^ td1[(s0 >> 16) & 0xFF]
            ^ td2[(s3 >> 8) & 0xFF] ^ td3[s2 & 0xFF] ^ ik[1]
        )
        t2 = (
            td0[s2 >> 24] ^ td1[(s1 >> 16) & 0xFF]
            ^ td2[(s0 >> 8) & 0xFF] ^ td3[s3 & 0xFF] ^ ik[2]
        )
        t3 = (
            td0[s3 >> 24] ^ td1[(s2 >> 16) & 0xFF]
            ^ td2[(s1 >> 8) & 0xFF] ^ td3[s0 & 0xFF] ^ ik[3]
        )
        s0, s1, s2, s3 = t0, t1, t2, t3
    k = _words(rks[0])
    sb = _INV_SBOX
    out = bytearray(16)
    for i, (a, b, c, d, kw) in enumerate(
        (
            (s0, s3, s2, s1, k[0]),
            (s1, s0, s3, s2, k[1]),
            (s2, s1, s0, s3, k[2]),
            (s3, s2, s1, s0, k[3]),
        )
    ):
        w = (
            (sb[a >> 24] << 24) | (sb[(b >> 16) & 0xFF] << 16)
            | (sb[(c >> 8) & 0xFF] << 8) | sb[d & 0xFF]
        ) ^ kw
        out[4 * i : 4 * i + 4] = w.to_bytes(4, "big")
    return bytes(out)


_MUL = {
    m: [_gf_mul(x, m) for x in range(256)] for m in (9, 11, 13, 14)
}


def _inv_mix_word(w: int) -> int:
    a, b, c, d = w >> 24, (w >> 16) & 0xFF, (w >> 8) & 0xFF, w & 0xFF
    m9, m11, m13, m14 = _MUL[9], _MUL[11], _MUL[13], _MUL[14]
    return _pack(
        m14[a] ^ m11[b] ^ m13[c] ^ m9[d],
        m9[a] ^ m14[b] ^ m11[c] ^ m13[d],
        m13[a] ^ m9[b] ^ m14[c] ^ m11[d],
        m11[a] ^ m13[b] ^ m9[c] ^ m14[d],
    )


def _xor(a: bytes, b: bytes) -> bytes:
    return bytes(x ^ y for x, y in zip(a, b))


def _pure_cbc(key: bytes, iv: bytes, data: bytes, encrypt: bool) -> bytes:
    """Unpadded CBC over block-aligned data, pure-Python engine."""
    rks = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        if encrypt:
            prev = _encrypt_block(_xor(blk, prev), rks)
            out += prev
        else:
            out += _xor(_decrypt_block(blk, rks), prev)
            prev = blk
    return bytes(out)


def _load_evp():
    """ctypes handle to OpenSSL's EVP CBC primitives, or None.

    Verified against the pure engine on the FIPS-197 C.1 vector
    before being trusted; any load/symbol/self-test failure degrades
    to the pure path silently (same results, Python speed)."""
    if os.environ.get("SPARK_GRAFT_PURE_AES"):
        return None
    try:
        import ctypes
        import ctypes.util

        name = ctypes.util.find_library("crypto")
        lib = None
        for cand in ([name] if name else []) + [
            "libcrypto.so.3",
            "libcrypto.so.1.1",
            "libcrypto.so",
        ]:
            try:
                lib = ctypes.CDLL(cand)
                break
            except OSError:
                continue
        if lib is None:
            return None
        lib.EVP_CIPHER_CTX_new.restype = ctypes.c_void_p
        lib.EVP_CIPHER_CTX_free.argtypes = [ctypes.c_void_p]
        for f in ("EVP_aes_128_cbc", "EVP_aes_192_cbc", "EVP_aes_256_cbc"):
            getattr(lib, f).restype = ctypes.c_void_p
        lib.EVP_CipherInit_ex.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_int,
        ]
        lib.EVP_CipherInit_ex.restype = ctypes.c_int
        lib.EVP_CIPHER_CTX_set_padding.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int,
        ]
        lib.EVP_CipherUpdate.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_char_p,
            ctypes.c_int,
        ]
        lib.EVP_CipherUpdate.restype = ctypes.c_int

        def run(key: bytes, iv: bytes, data: bytes, encrypt: bool) -> bytes:
            cipher = {
                16: lib.EVP_aes_128_cbc,
                24: lib.EVP_aes_192_cbc,
                32: lib.EVP_aes_256_cbc,
            }[len(key)]()
            ctx = lib.EVP_CIPHER_CTX_new()
            if not ctx:
                raise MemoryError("EVP_CIPHER_CTX_new failed")
            try:
                if (
                    lib.EVP_CipherInit_ex(
                        ctx, cipher, None, key, iv, 1 if encrypt else 0
                    )
                    != 1
                ):
                    raise ValueError("EVP_CipherInit_ex failed")
                lib.EVP_CIPHER_CTX_set_padding(ctx, 0)
                out = ctypes.create_string_buffer(len(data) + 16)
                n = ctypes.c_int(0)
                if (
                    lib.EVP_CipherUpdate(
                        ctx, out, ctypes.byref(n), data, len(data)
                    )
                    != 1
                ):
                    raise ValueError("EVP_CipherUpdate failed")
                return out.raw[: n.value]
            finally:
                lib.EVP_CIPHER_CTX_free(ctx)

        # FIPS-197 Appendix C.1 single-block vector, CBC with a zero
        # IV degenerates to raw AES — cross-check EVP vs pure engine.
        key = bytes(range(16))
        pt = bytes.fromhex("00112233445566778899aabbccddeeff")
        want = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
        if run(key, b"\x00" * 16, pt, True) != want:
            return None
        if _pure_cbc(key, b"\x00" * 16, pt, True) != want:
            return None
        return run
    except Exception:  # noqa: BLE001 — optional fast path, never fatal
        return None


_EVP_CBC = _load_evp()


def _cbc(key: bytes, iv: bytes, data: bytes, encrypt: bool) -> bytes:
    if _EVP_CBC is not None:
        return _EVP_CBC(key, iv, data, encrypt)
    return _pure_cbc(key, iv, data, encrypt)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC encrypt with PKCS#7 padding; returns ciphertext (iv NOT
    prepended — the PDF layer owns that layout)."""
    pad = 16 - len(data) % 16
    return _cbc(key, iv, data + bytes([pad]) * pad, True)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC decrypt + PKCS#7 unpad; raises ValueError on ragged input
    or corrupt padding (poison crawled bytes must fail loudly into
    the dead-letter, not return garbage silently)."""
    if len(data) % 16 or not data:
        raise ValueError("AES-CBC ciphertext is not block-aligned")
    out = _cbc(key, iv, data, False)
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytes([pad]) * pad:
        raise ValueError("AES-CBC padding check failed (wrong key?)")
    return bytes(out[:-pad])


def aes_cbc_nopad(
    key: bytes, iv: bytes, data: bytes, encrypt: bool
) -> bytes:
    """Unpadded CBC over block-aligned data — the PDF 2.0 revision-6
    KDF (ISO 32000-2 Algorithm 2.B) and file-key unwrap use this."""
    if len(data) % 16:
        raise ValueError("unpadded AES-CBC needs block-aligned data")
    return _cbc(key, iv, data, encrypt)
