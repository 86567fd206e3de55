"""PDF standard security handler — decryption of encrypted PDFs with
an EMPTY user password (the ubiquitous "owner-locked" corpus case),
per the PUBLIC specs: ISO 32000-1 §7.6 (RC4 V2/R3 and AESV2 V4/R4) and
ISO 32000-2 §7.6.4 (AESV3 V5/R6). No crypto library in the container,
so the primitives live here too:

- AES-128/256 implemented from FIPS-197 first principles — the S-box is
  GENERATED from the spec's GF(2^8) inverse + affine transform (no
  hand-typed table to mistype) and the implementation is pinned by the
  FIPS-197 Appendix C known-answer vectors in tests/test_pdfcrypt.py.
- RC4 (the historic PDF cipher; public description), pinned by the
  classic published test vector.
- MD5/SHA-256/384/512 from hashlib.

Scope note (documented seam): string objects outside content streams
stay ciphertext — the text extractor consumes none (page text lives in
content STREAMS, which are decrypted, as are object streams); per-object
/Crypt filters and non-empty user passwords quarantine with a named
reason. Public-key (PKCS#7) security handlers are out of scope.
"""

from __future__ import annotations

import hashlib
import json
import struct
from functools import lru_cache

# ---------------------------------------------------------------------------
# AES (FIPS-197): S-box generated from the spec definition
# ---------------------------------------------------------------------------


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
    # multiplicative inverse in GF(2^8) then the affine transform
    # (FIPS-197 §5.1.1) — generated, not transcribed. Inverses via
    # log/antilog over the generator 3 (255 steps, not the O(n^2)
    # pair search — this runs at import in every Spark worker).
    exp = [0] * 255
    log = [0] * 256
    a = 1
    for i in range(255):
        exp[i] = a
        log[a] = i
        a = _gf_mul(a, 3)
    inv = [0] * 256
    for x in range(1, 256):
        inv[x] = exp[(255 - log[x]) % 255]
    sbox = bytearray(256)
    for x in range(256):
        b = inv[x]
        s = 0
        for bit in range(8):
            s |= (
                (
                    (b >> bit)
                    ^ (b >> ((bit + 4) % 8))
                    ^ (b >> ((bit + 5) % 8))
                    ^ (b >> ((bit + 6) % 8))
                    ^ (b >> ((bit + 7) % 8))
                    ^ (0x63 >> bit)
                )
                & 1
            ) << bit
        sbox[x] = s
    inv_sbox = bytearray(256)
    for i, v in enumerate(sbox):
        inv_sbox[v] = i
    return bytes(sbox), bytes(inv_sbox)


_SBOX, _INV_SBOX = _build_sbox()
# fixed-multiplier tables make the MixColumns hot path table lookups
_M = {m: bytes(_gf_mul(x, m) for x in range(256)) for m in
      (2, 3, 9, 11, 13, 14)}
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36, 0x6C, 0xD8, 0xAB, 0x4D]


def _expand_key(key: bytes) -> list[list[int]]:
    nk = len(key) // 4
    if nk not in (4, 8):
        raise ValueError(f"AES key must be 16 or 32 bytes, got {len(key)}")
    nr = nk + 6
    words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk == 8 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    # group into round keys of 16 bytes
    return [
        [b for w in words[4 * r : 4 * r + 4] for b in w]
        for r in range(nr + 1)
    ]


#: T-tables for the encrypt hot path (hash_2B runs 64+ CBC rounds per
#: credential): T0[a] packs MixColumns(SubBytes) of one byte as a u32
#: column contribution; T1-T3 are byte rotations of T0.
_T0 = [
    (_M[2][_SBOX[a]] << 24)
    | (_SBOX[a] << 16)
    | (_SBOX[a] << 8)
    | _M[3][_SBOX[a]]
    for a in range(256)
]
_T1 = [((t >> 8) | ((t & 0xFF) << 24)) & 0xFFFFFFFF for t in _T0]
_T2 = [((t >> 8) | ((t & 0xFF) << 24)) & 0xFFFFFFFF for t in _T1]
_T3 = [((t >> 8) | ((t & 0xFF) << 24)) & 0xFFFFFFFF for t in _T2]


def _rk_words(rks: list[list[int]]) -> list[list[int]]:
    return [
        [int.from_bytes(bytes(rk[4 * c : 4 * c + 4]), "big") for c in range(4)]
        for rk in rks
    ]


def _encrypt_block(block: bytes, rks: list[list[int]]) -> bytes:
    """T-table formulation (column-major u32 state) — verified against
    the FIPS-197 Appendix C vectors like the byte-wise decrypt."""
    return _encrypt_block_w(block, _rk_words(rks))


def _encrypt_block_w(block: bytes, w: list[list[int]]) -> bytes:
    return _encrypt_block_i(int.from_bytes(block, "big"), w).to_bytes(
        16, "big"
    )


def _encrypt_block_i(x: int, w: list[list[int]]) -> int:
    nr = len(w) - 1
    c0 = (x >> 96) ^ w[0][0]
    c1 = ((x >> 64) & 0xFFFFFFFF) ^ w[0][1]
    c2 = ((x >> 32) & 0xFFFFFFFF) ^ w[0][2]
    c3 = (x & 0xFFFFFFFF) ^ w[0][3]
    t0, t1, t2, t3 = _T0, _T1, _T2, _T3
    for rnd in range(1, nr):
        rk = w[rnd]
        n0 = (
            t0[c0 >> 24] ^ t1[(c1 >> 16) & 0xFF]
            ^ t2[(c2 >> 8) & 0xFF] ^ t3[c3 & 0xFF] ^ rk[0]
        )
        n1 = (
            t0[c1 >> 24] ^ t1[(c2 >> 16) & 0xFF]
            ^ t2[(c3 >> 8) & 0xFF] ^ t3[c0 & 0xFF] ^ rk[1]
        )
        n2 = (
            t0[c2 >> 24] ^ t1[(c3 >> 16) & 0xFF]
            ^ t2[(c0 >> 8) & 0xFF] ^ t3[c1 & 0xFF] ^ rk[2]
        )
        n3 = (
            t0[c3 >> 24] ^ t1[(c0 >> 16) & 0xFF]
            ^ t2[(c1 >> 8) & 0xFF] ^ t3[c2 & 0xFF] ^ rk[3]
        )
        c0, c1, c2, c3 = n0, n1, n2, n3
    rk = w[nr]
    s = _SBOX
    o0 = (
        (s[c0 >> 24] << 24) | (s[(c1 >> 16) & 0xFF] << 16)
        | (s[(c2 >> 8) & 0xFF] << 8) | s[c3 & 0xFF]
    ) ^ rk[0]
    o1 = (
        (s[c1 >> 24] << 24) | (s[(c2 >> 16) & 0xFF] << 16)
        | (s[(c3 >> 8) & 0xFF] << 8) | s[c0 & 0xFF]
    ) ^ rk[1]
    o2 = (
        (s[c2 >> 24] << 24) | (s[(c3 >> 16) & 0xFF] << 16)
        | (s[(c0 >> 8) & 0xFF] << 8) | s[c1 & 0xFF]
    ) ^ rk[2]
    o3 = (
        (s[c3 >> 24] << 24) | (s[(c0 >> 16) & 0xFF] << 16)
        | (s[(c1 >> 8) & 0xFF] << 8) | s[c2 & 0xFF]
    ) ^ rk[3]
    return (o0 << 96) | (o1 << 64) | (o2 << 32) | o3


#: inverse T-tables for the decrypt hot path (the FIPS-197 §5.3.5
#: "equivalent inverse cipher"): D0[a] packs InvMixColumns of the
#: InvSubBytes'd byte as a u32 column contribution; D1-D3 are byte
#: rotations, exactly mirroring the _T0.._T3 encrypt tables. The old
#: byte-wise inverse rounds (list comprehensions per round) were the
#: single hottest kernel in the PDF decrypt profile.
_D0 = [
    (_M[14][_INV_SBOX[a]] << 24)
    | (_M[9][_INV_SBOX[a]] << 16)
    | (_M[13][_INV_SBOX[a]] << 8)
    | _M[11][_INV_SBOX[a]]
    for a in range(256)
]
_D1 = [((t >> 8) | ((t & 0xFF) << 24)) & 0xFFFFFFFF for t in _D0]
_D2 = [((t >> 8) | ((t & 0xFF) << 24)) & 0xFFFFFFFF for t in _D1]
_D3 = [((t >> 8) | ((t & 0xFF) << 24)) & 0xFFFFFFFF for t in _D2]


def _imc_word(k: int) -> int:
    """InvMixColumns over one big-endian u32 key word (the equivalent
    inverse cipher transforms the middle round keys once per key)."""
    a, b, c, d = k >> 24, (k >> 16) & 0xFF, (k >> 8) & 0xFF, k & 0xFF
    m9, m11, m13, m14 = _M[9], _M[11], _M[13], _M[14]
    return (
        ((m14[a] ^ m11[b] ^ m13[c] ^ m9[d]) << 24)
        | ((m9[a] ^ m14[b] ^ m11[c] ^ m13[d]) << 16)
        | ((m13[a] ^ m9[b] ^ m14[c] ^ m11[d]) << 8)
        | (m11[a] ^ m13[b] ^ m9[c] ^ m14[d])
    )


def _dec_key_words(rks: list[list[int]]) -> list[list[int]]:
    """Round keys for the equivalent inverse cipher: plain words for the
    first/last AddRoundKey, InvMixColumns'd words for middle rounds."""
    w = _rk_words(rks)
    nr = len(w) - 1
    return [w[0]] + [[_imc_word(k) for k in w[r]] for r in range(1, nr)] + [w[nr]]


def _decrypt_block(block: bytes, rks: list[list[int]]) -> bytes:
    """Byte-key-schedule entry point (kept for the FIPS-vector tests);
    CBC loops pre-derive the word schedule once via _dec_key_words."""
    return _decrypt_block_i(
        int.from_bytes(block, "big"), _dec_key_words(rks)
    ).to_bytes(16, "big")


def _decrypt_block_i(x: int, dw: list[list[int]]) -> int:
    nr = len(dw) - 1
    c0 = (x >> 96) ^ dw[nr][0]
    c1 = ((x >> 64) & 0xFFFFFFFF) ^ dw[nr][1]
    c2 = ((x >> 32) & 0xFFFFFFFF) ^ dw[nr][2]
    c3 = (x & 0xFFFFFFFF) ^ dw[nr][3]
    d0, d1, d2, d3 = _D0, _D1, _D2, _D3
    for rnd in range(nr - 1, 0, -1):
        rk = dw[rnd]
        n0 = (
            d0[c0 >> 24] ^ d1[(c3 >> 16) & 0xFF]
            ^ d2[(c2 >> 8) & 0xFF] ^ d3[c1 & 0xFF] ^ rk[0]
        )
        n1 = (
            d0[c1 >> 24] ^ d1[(c0 >> 16) & 0xFF]
            ^ d2[(c3 >> 8) & 0xFF] ^ d3[c2 & 0xFF] ^ rk[1]
        )
        n2 = (
            d0[c2 >> 24] ^ d1[(c1 >> 16) & 0xFF]
            ^ d2[(c0 >> 8) & 0xFF] ^ d3[c3 & 0xFF] ^ rk[2]
        )
        n3 = (
            d0[c3 >> 24] ^ d1[(c2 >> 16) & 0xFF]
            ^ d2[(c1 >> 8) & 0xFF] ^ d3[c0 & 0xFF] ^ rk[3]
        )
        c0, c1, c2, c3 = n0, n1, n2, n3
    rk = dw[0]
    s = _INV_SBOX
    o0 = (
        (s[c0 >> 24] << 24) | (s[(c3 >> 16) & 0xFF] << 16)
        | (s[(c2 >> 8) & 0xFF] << 8) | s[c1 & 0xFF]
    ) ^ rk[0]
    o1 = (
        (s[c1 >> 24] << 24) | (s[(c0 >> 16) & 0xFF] << 16)
        | (s[(c3 >> 8) & 0xFF] << 8) | s[c2 & 0xFF]
    ) ^ rk[1]
    o2 = (
        (s[c2 >> 24] << 24) | (s[(c1 >> 16) & 0xFF] << 16)
        | (s[(c0 >> 8) & 0xFF] << 8) | s[c3 & 0xFF]
    ) ^ rk[2]
    o3 = (
        (s[c3 >> 24] << 24) | (s[(c2 >> 16) & 0xFF] << 16)
        | (s[(c1 >> 8) & 0xFF] << 8) | s[c0 & 0xFF]
    ) ^ rk[3]
    return (o0 << 96) | (o1 << 64) | (o2 << 32) | o3


@lru_cache(maxsize=256)
def _enc_key_words_cached(key: bytes) -> list[list[int]]:
    return _rk_words(_expand_key(key))


@lru_cache(maxsize=256)
def _dec_key_words_cached(key: bytes) -> list[list[int]]:
    return _dec_key_words(_expand_key(key))


def aes_cbc_encrypt(data: bytes, key: bytes, iv: bytes, pad: bool) -> bytes:
    if pad:
        n = 16 - len(data) % 16
        data = data + bytes([n]) * n
    if len(data) % 16:
        raise ValueError("AES-CBC without padding needs 16-byte blocks")
    # key-schedule cache: AESV3 decrypts/encrypts every stream of a doc
    # under the SAME file key (and hash_2b re-keys in a tight loop), so
    # re-expanding per call was ~15% of the decrypt profile. bytes keys,
    # bounded LRU — per-object R3/AESV2 keys just rotate through it.
    w = _enc_key_words_cached(key)
    out = bytearray()
    prev = int.from_bytes(iv, "big")
    for i in range(0, len(data), 16):
        prev = _encrypt_block_i(
            int.from_bytes(data[i : i + 16], "big") ^ prev, w
        )
        out += prev.to_bytes(16, "big")
    return bytes(out)


def aes_cbc_decrypt(data: bytes, key: bytes, iv: bytes, unpad: bool) -> bytes:
    if len(data) % 16 or (unpad and not data):
        raise ValueError("AES-CBC ciphertext not block-aligned")
    dw = _dec_key_words_cached(key)
    out = bytearray()
    prev = int.from_bytes(iv, "big")
    for i in range(0, len(data), 16):
        block = int.from_bytes(data[i : i + 16], "big")
        out += (_decrypt_block_i(block, dw) ^ prev).to_bytes(16, "big")
        prev = block
    if unpad:
        n = out[-1]
        if not 1 <= n <= 16 or out[-n:] != bytes([n]) * n:
            raise ValueError("AES-CBC padding invalid (wrong key?)")
        del out[-n:]
    return bytes(out)


def aes_ecb_encrypt_block(block: bytes, key: bytes) -> bytes:
    return _encrypt_block(block, _expand_key(key))


def rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) % 256
        s[i], s[j] = s[j], s[i]
    out = bytearray()
    i = j = 0
    for b in data:
        i = (i + 1) % 256
        j = (j + s[i]) % 256
        s[i], s[j] = s[j], s[i]
        out.append(b ^ s[(s[i] + s[j]) % 256])
    return bytes(out)


# ---------------------------------------------------------------------------
# Standard security handler
# ---------------------------------------------------------------------------

#: ISO 32000-1 Table 21 padding string, verbatim.
PDF_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _pad_pw(pw: bytes) -> bytes:
    return (pw + PDF_PAD)[:32]


def _file_key_r34(
    user_pw: bytes,
    o: bytes,
    p: int,
    id0: bytes,
    n: int,
    r: int,
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the RC4-era file key. Step f: for R4+ with
    /EncryptMetadata false the MD5 input gains 4 bytes of 0xFF."""
    md5_in = _pad_pw(user_pw) + o[:32] + struct.pack("<i", p) + id0
    if r >= 4 and not encrypt_metadata:
        md5_in += b"\xff\xff\xff\xff"
    h = hashlib.md5(md5_in).digest()
    key = h[:n]
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()[:n]
    return key


def _u_value_r3(key: bytes, id0: bytes) -> bytes:
    """Algorithm 5: the 16 significant bytes of /U for R3/R4."""
    x = rc4(key, hashlib.md5(PDF_PAD + id0).digest())
    for i in range(1, 20):
        x = rc4(bytes(b ^ i for b in key), x)
    return x


def _o_value_r3(owner_pw: bytes, user_pw: bytes, n: int) -> bytes:
    """Algorithm 3 (fixture side): /O from the owner password."""
    h = hashlib.md5(_pad_pw(owner_pw)).digest()
    for _ in range(50):
        h = hashlib.md5(h).digest()
    okey = h[:n]
    o = rc4(okey, _pad_pw(user_pw))
    for i in range(1, 20):
        o = rc4(bytes(b ^ i for b in okey), o)
    return o


import functools


@functools.lru_cache(maxsize=256)
def _hash_2b(pw: bytes, salt: bytes, udata: bytes) -> bytes:
    """ISO 32000-2 Algorithm 2.B — the R6 iterated hash. The spec's
    64+ AES-CBC rounds are a deliberate brute-force cost; cached per
    (pw, salt, udata) so a worker pays it once per distinct credential,
    not once per document."""
    k = hashlib.sha256(pw + salt + udata).digest()
    i = 0
    while True:
        k1 = (pw + k + udata) * 64
        e = aes_cbc_encrypt(k1, k[:16], k[16:32], pad=False)
        k = (
            hashlib.sha256,
            hashlib.sha384,
            hashlib.sha512,
        )[sum(e[:16]) % 3](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


class StandardDecryptor:
    """Empty-user-password decryptor. ``encrypt`` is the resolved
    /Encrypt dict (strings as latin-1 str from the PDF parser), ``id0``
    the first /ID string's bytes. Raises ValueError with a named
    reason for every unsupported or failed shape — the caller's
    quarantine contract."""

    def __init__(self, encrypt: dict, id0: bytes) -> None:
        if encrypt.get("Filter") != "Standard":
            raise ValueError(
                f"encrypted PDF: unsupported handler {encrypt.get('Filter')!r}"
            )
        v = encrypt.get("V")
        r = encrypt.get("R")
        o = _latin(encrypt.get("O"))
        u = _latin(encrypt.get("U"))
        p = encrypt.get("P")
        if not isinstance(p, int) or not isinstance(v, int):
            raise ValueError("encrypted PDF: missing /P or /V")
        self.aes = False
        if v in (1, 2):
            n = int(encrypt.get("Length", 40)) // 8
            self.key = _file_key_r34(b"", o, p, id0, n, r)
            self.n = n
            if r == 2:
                ok = rc4(self.key, PDF_PAD) == u[:32]
            else:
                ok = _u_value_r3(self.key, id0) == u[:16]
            if not ok:
                raise ValueError(
                    "encrypted PDF: non-empty user password (RC4)"
                )
        elif v == 4:
            cf = encrypt.get("CF", {})
            stmf = encrypt.get("StmF", "Identity")
            cfm = None
            if isinstance(cf, dict) and isinstance(cf.get(stmf), dict):
                cfm = cf[stmf].get("CFM")
            if cfm == "AESV2":
                self.aes = True
            elif cfm != "V2":
                raise ValueError(
                    f"encrypted PDF: unsupported crypt filter {cfm!r}"
                )
            n = int(encrypt.get("Length", 128)) // 8
            em = encrypt.get("EncryptMetadata", True)
            self.key = _file_key_r34(
                b"", o, p, id0, n, r, encrypt_metadata=bool(em)
            )
            self.n = n
            if _u_value_r3(self.key, id0) != u[:16]:
                raise ValueError(
                    "encrypted PDF: non-empty user password (V4)"
                )
        elif v == 5:
            if len(u) < 48:
                raise ValueError("encrypted PDF: /U shorter than 48 bytes")
            if _hash_2b(b"", u[32:40], b"") != u[:32]:
                raise ValueError(
                    "encrypted PDF: non-empty user password (V5)"
                )
            ue = _latin(encrypt.get("UE"))
            ikey = _hash_2b(b"", u[40:48], b"")
            if len(ue) != 32:
                raise ValueError("encrypted PDF: /UE is not 32 bytes")
            self.key = aes_cbc_decrypt(
                ue, ikey, b"\x00" * 16, unpad=False
            )
            self.aes = True
            self.n = 32
        else:
            raise ValueError(f"encrypted PDF: unsupported /V {v}")

    def _object_key(self, num: int, gen: int) -> bytes:
        if self.n == 32:  # V5: the file key is used directly
            return self.key
        h = hashlib.md5(
            self.key
            + struct.pack("<I", num)[:3]
            + struct.pack("<I", gen)[:2]
            + (b"sAlT" if self.aes else b"")
        ).digest()
        return h[: min(self.n + 5, 16)]

    def decrypt_stream(self, num: int, gen: int, raw: bytes) -> bytes:
        k = self._object_key(num, gen)
        if self.aes:
            if len(raw) < 16:
                raise ValueError("AES stream shorter than its IV")
            return aes_cbc_decrypt(raw[16:], k, raw[:16], unpad=True)
        return rc4(k, raw)

    def encrypt_stream(self, num: int, gen: int, data: bytes) -> bytes:
        """Fixture side — IV derived deterministically from (num, gen)
        so builds are reproducible."""
        k = self._object_key(num, gen)
        if self.aes:
            iv = hashlib.md5(b"iv" + struct.pack("<II", num, gen)).digest()
            return iv + aes_cbc_encrypt(data, k, iv, pad=True)
        return rc4(k, data)


def _latin(v: object) -> bytes:
    if isinstance(v, bytes):
        return v
    if isinstance(v, str):
        return v.encode("latin-1")
    raise ValueError("encrypted PDF: /O //U values missing")


# ---------------------------------------------------------------------------
# Fixture-side builders: a complete /Encrypt dict + matching decryptor
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _aesv3_materials(p: int) -> tuple[bytes, bytes, bytes, bytes, bytes]:
    """Fixture-wide constant V5/R6 credentials (O, OE, U, UE, Perms):
    Algorithm 2.B costs 64+ AES-CBC rounds BY DESIGN (brute-force
    hardening), so per-doc salts would pay it per document for zero
    extra certification — the doc-varying part (stream content, object
    ids, IVs) still differs. Cached per worker, like _hash_2b."""
    file_key = hashlib.sha256(b"fixture-file-key").digest()
    vs = hashlib.md5(b"fixture-vs").digest()[:8]
    ks = hashlib.md5(b"fixture-ks").digest()[:8]
    u = _hash_2b(b"", vs, b"") + vs + ks
    ue = aes_cbc_encrypt(
        file_key, _hash_2b(b"", ks, b""), b"\x00" * 16, pad=False
    )
    owner_pw = b"fixture-owner"
    ovs = hashlib.md5(b"fixture-ovs").digest()[:8]
    oks = hashlib.md5(b"fixture-oks").digest()[:8]
    o = _hash_2b(owner_pw, ovs, u[:48]) + ovs + oks
    oe = aes_cbc_encrypt(
        file_key, _hash_2b(owner_pw, oks, u[:48]), b"\x00" * 16,
        pad=False,
    )
    perms = aes_ecb_encrypt_block(
        struct.pack("<i", p) + b"\xff\xff\xff\xffTadb" + b"\x00" * 4,
        file_key,
    )
    return o, oe, u, ue, perms


@functools.lru_cache(maxsize=16)
def _r34_materials(kind: str, p: int) -> tuple[bytes, bytes, bytes]:
    """Fixture-wide constant R3/R4 credentials (O, U, id0) — same
    rationale as _aesv3_materials: the per-file key DERIVATION (51
    MD5 rounds + the 20-pass RC4 chains) is the format's deliberate
    per-credential cost; per-doc credentials would pay it per document
    for zero extra certification, while per-OBJECT keys still differ
    per stream. Cached per worker."""
    id0 = hashlib.md5(b"fixture-id0").digest()
    owner_pw = b"fixture-owner"
    n = 16
    r = 3 if kind == "rc4" else 4
    o = _o_value_r3(owner_pw, b"", n)
    key = _file_key_r34(b"", o, p, id0, n, r)
    u = _u_value_r3(key, id0) + b"\x00" * 16
    return o, u, id0


def build_encryption(kind: str, doc_id: int, p: int = -4) -> tuple[dict, bytes, "StandardDecryptor"]:
    """(encrypt dict (python values), id0 bytes, ready decryptor) for
    fixture PDFs. ``kind``: 'rc4' = V2/R3 128-bit, 'aesv2' = V4/R4,
    'aesv3' = V5/R6. Owner password is non-empty (deterministic), user
    password EMPTY — the owner-locked shape. Credentials are
    fixture-wide constants (see _r34_materials/_aesv3_materials);
    per-object stream keys still vary."""
    if kind in ("rc4", "aesv2"):
        r = 3 if kind == "rc4" else 4
        o, u, id0 = _r34_materials(kind, p)
        enc: dict = {
            "Filter": "Standard",
            "V": 2 if kind == "rc4" else 4,
            "R": r,
            "Length": 128,
            "P": p,
            "O": o,
            "U": u,
        }
        if kind == "aesv2":
            enc["CF"] = {"StdCF": {"CFM": "AESV2", "AuthEvent": "DocOpen"}}
            enc["StmF"] = "StdCF"
            enc["StrF"] = "StdCF"
    elif kind == "aesv3":
        o, oe, u, ue, perms = _aesv3_materials(p)
        id0 = hashlib.md5(b"fixture-id0").digest()  # unused by V5 crypto
        enc = {
            "Filter": "Standard",
            "V": 5,
            "R": 6,
            "Length": 256,
            "P": p,
            "O": o,
            "U": u,
            "OE": oe,
            "UE": ue,
            "Perms": perms,
            "CF": {"StdCF": {"CFM": "AESV3", "AuthEvent": "DocOpen"}},
            "StmF": "StdCF",
            "StrF": "StdCF",
        }
    else:
        raise ValueError(f"unknown fixture encryption kind {kind!r}")
    dec_dict = {
        k: (v.decode("latin-1") if isinstance(v, bytes) else v)
        for k, v in enc.items()
    }
    return enc, id0, cached_decryptor(
        json.dumps(dec_dict, sort_keys=True), id0
    )


@functools.lru_cache(maxsize=64)
def cached_decryptor(enc_json: str, id0: bytes) -> "StandardDecryptor":
    """Decryptor per DISTINCT credentials: the handler's key
    derivation (51 MD5 rounds + 20-pass RC4 chains, or the R6
    64-round hash) is per-credential work, not per-document work —
    same /Encrypt dict and /ID always derive the same key, so readers
    cache it (enc_json = the dict JSON-serialized with sorted keys).
    The decryptor is immutable after construction."""
    return StandardDecryptor(json.loads(enc_json), id0)
