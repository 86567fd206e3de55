"""PDF standard security handler: AES pinned by FIPS-197 Appendix C,
RC4 by its classic published vector, and the handler's three supported
schemes (RC4 V2/R3, AESV2 V4/R4, AESV3 V5/R6) end-to-end through the
PDF fixtures — including the wrong-password and corruption quarantines."""

from __future__ import annotations

import pytest

from user_behavior_spark_pipeline_spark.operators.pdf import (
    pdf_text_extract,
    synth_pdf_bytes,
    synth_pdf_modern_bytes,
)
from user_behavior_spark_pipeline_spark.operators.pdfcrypt import (
    StandardDecryptor,
    _decrypt_block,
    _encrypt_block,
    _expand_key,
    aes_cbc_decrypt,
    aes_cbc_encrypt,
    build_encryption,
    rc4,
)

_PT = bytes.fromhex("00112233445566778899aabbccddeeff")
_K128 = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
_K256 = bytes.fromhex(
    "000102030405060708090a0b0c0d0e0f"
    "101112131415161718191a1b1c1d1e1f"
)


def test_fips197_appendix_c_vectors():
    assert (
        _encrypt_block(_PT, _expand_key(_K128)).hex()
        == "69c4e0d86a7b0430d8cdb78070b4c55a"
    )
    assert (
        _decrypt_block(
            bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a"),
            _expand_key(_K128),
        )
        == _PT
    )
    assert (
        _encrypt_block(_PT, _expand_key(_K256)).hex()
        == "8ea2b7ca516745bfeafc49904b496089"
    )
    assert (
        _decrypt_block(
            bytes.fromhex("8ea2b7ca516745bfeafc49904b496089"),
            _expand_key(_K256),
        )
        == _PT
    )


def test_rc4_published_vector():
    assert rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    # symmetric
    assert rc4(b"Key", rc4(b"Key", b"round trip")) == b"round trip"


def test_cbc_padding_and_alignment_quarantine():
    data = b"content " * 9
    iv = bytes(range(16))
    blob = aes_cbc_encrypt(data, _K256, iv, pad=True)
    assert aes_cbc_decrypt(blob, _K256, iv, unpad=True) == data
    with pytest.raises(ValueError, match="block-aligned"):
        aes_cbc_decrypt(blob[:-3], _K256, iv, unpad=True)
    with pytest.raises(ValueError, match="padding"):
        aes_cbc_decrypt(blob, bytes(32), iv, unpad=True)  # wrong key


@pytest.mark.parametrize("kind", ["rc4", "aesv2", "aesv3"])
def test_handler_stream_round_trip_from_dict_only(kind):
    """A decryptor built ONLY from the serialized dict values must
    agree with the builder's — the reader never sees builder state."""
    enc, id0, dec = build_encryption(kind, 11)
    data = b"BT (secret) Tj ET" * 3
    blob = dec.encrypt_stream(5, 0, data)
    assert blob != data
    d2 = StandardDecryptor(
        {
            k: (v.decode("latin-1") if isinstance(v, bytes) else v)
            for k, v in enc.items()
        },
        id0,
    )
    assert d2.decrypt_stream(5, 0, blob) == data
    # per-object keys differ (V5 uses the file key for every object):
    # the wrong object id gives different bytes (RC4) or invalid
    # padding (AES) — never the plaintext
    if kind != "aesv3":
        try:
            assert dec.decrypt_stream(6, 0, blob) != data
        except ValueError as e:
            assert "padding" in str(e)


def test_non_empty_user_password_quarantines():
    """A file whose U was derived from a REAL user password must
    refuse the empty-password open with a named reason."""
    from user_behavior_spark_pipeline_spark.operators.pdfcrypt import (
        _file_key_r34,
        _o_value_r3,
        _u_value_r3,
    )

    o = _o_value_r3(b"owner", b"user-secret", 16)
    id0 = b"\x01" * 16
    key = _file_key_r34(b"user-secret", o, -4, id0, 16, 3)
    u = _u_value_r3(key, id0) + b"\x00" * 16
    enc = {
        "Filter": "Standard", "V": 2, "R": 3, "Length": 128,
        "P": -4, "O": o.decode("latin-1"), "U": u.decode("latin-1"),
    }
    with pytest.raises(ValueError, match="non-empty user password"):
        StandardDecryptor(enc, id0)


def test_unsupported_shapes_quarantine_with_names():
    enc, id0, _ = build_encryption("rc4", 3)
    bad = dict(enc)
    bad["Filter"] = "MyCustomHandler"
    with pytest.raises(ValueError, match="unsupported handler"):
        StandardDecryptor(_strs(bad), id0)
    bad = dict(enc)
    bad["V"] = 3
    with pytest.raises(ValueError, match="unsupported /V"):
        StandardDecryptor(_strs(bad), id0)
    enc4, id4, _ = build_encryption("aesv2", 3)
    bad = dict(enc4)
    bad["CF"] = {"StdCF": {"CFM": "Unknown"}}
    with pytest.raises(ValueError, match="unsupported crypt filter"):
        StandardDecryptor(_strs(bad), id4)


def _strs(enc):
    return {
        k: (v.decode("latin-1") if isinstance(v, bytes) else v)
        for k, v in enc.items()
    }


def test_encrypted_fixture_rotation_extracts_clear_text():
    """doc%3 rotation: 1 = RC4, 2 = AESV2 on the classic layout;
    doc%3==1 = AESV3 on the modern layout — extraction is
    encryption-invariant (the oracle's closed form)."""
    for d in (1, 2, 4, 5, 7, 8):  # every encrypted slot, both parities
        out = pdf_text_extract(synth_pdf_bytes(d, f"pàge {d}"))
        assert out == {"n_pages": 2, "text": f"doc {d} pàge {d}"}, d
    for d in (1, 4, 7):  # modern AESV3 slots, both parities
        out = pdf_text_extract(synth_pdf_modern_bytes(d, f"bödy {d}"))
        t = f"bödy {d}"
        half = len(t) // 2
        assert out["n_pages"] == 3
        assert out["text"] == f"doc {d} {t[:half]}{t[half:]} tail {d}", d
    # the bytes really are ciphertext on disk
    assert b"BT" not in synth_pdf_bytes(1, "zz").split(b"stream")[1][:40]


def test_corrupt_ciphertext_quarantines_not_garbles(spark):
    """A flipped byte inside an encrypted FlateDecode stream must
    surface as a parse_error row (decrypt garbage fails inflate), not
    silent mojibake and not task death."""
    from user_behavior_spark_pipeline_spark.operators.pdf import pdf_text

    good = synth_pdf_bytes(2, "clear")  # even+%3==2: Flate under AESV2
    i = good.index(b"stream\n") + 24  # past the 16-byte IV
    bad = good[:i] + bytes([good[i] ^ 0xFF]) + good[i + 1 :]
    docs = spark.createDataFrame(
        [(2, bad)], "media_id long, payload binary"
    )
    rows = pdf_text(docs).collect()
    assert len(rows) == 1
    assert rows[0].parse_error is not None
    assert rows[0].text is None

def test_v4_encrypt_metadata_false_file_key():
    """ADVICE r13: Algorithm 2 step f — R4 with /EncryptMetadata false
    appends 0xFFFFFFFF to the MD5 input. A document built that way must
    validate /U and round-trip streams; the same credentials WITHOUT
    the flag must fail the /U check (proving the step is load-bearing,
    not a no-op)."""
    import hashlib

    from user_behavior_spark_pipeline_spark.operators.pdfcrypt import (
        _file_key_r34,
        _o_value_r3,
        _u_value_r3,
    )

    id0 = hashlib.md5(b"em-false-id0").digest()
    p = -4
    o = _o_value_r3(b"owner", b"", 16)
    key = _file_key_r34(b"", o, p, id0, 16, 4, encrypt_metadata=False)
    u = _u_value_r3(key, id0) + b"\x00" * 16
    enc = {
        "Filter": "Standard",
        "V": 4,
        "R": 4,
        "Length": 128,
        "P": p,
        "O": o,
        "U": u,
        "CF": {"StdCF": {"CFM": "AESV2"}},
        "StmF": "StdCF",
        "EncryptMetadata": False,
    }
    dec = StandardDecryptor(enc, id0)
    blob = b"metadata-unencrypted document body" * 3
    assert dec.decrypt_stream(7, 0, dec.encrypt_stream(7, 0, blob)) == blob
    # without the step the derived key differs -> /U mismatch
    enc_wrong = dict(enc)
    enc_wrong["EncryptMetadata"] = True
    with pytest.raises(ValueError, match="user password"):
        StandardDecryptor(enc_wrong, id0)
