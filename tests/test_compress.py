"""operators/compress.py: cap guards, codec roundtrips, quarantine
fuzz for the zstd/snappy helpers (the stdlib branches are fuzzed via
the tar family in test_walker_fuzz)."""

from __future__ import annotations

import random

import pytest

from user_behavior_spark_pipeline_spark.operators.compress import (
    ZSTD_MAGIC,
    decompress_transparent,
    snappy_compress,
    snappy_decompress,
    zstd_compress,
    zstd_decompress,
)


def test_roundtrips_and_magics():
    data = b"corpus shard content \xc3\xa9 " * 400
    z = zstd_compress(data)
    assert z[:4] == ZSTD_MAGIC
    assert zstd_decompress(z, 1 << 20) == data
    s = snappy_compress(data)
    assert snappy_decompress(s, 1 << 20) == data
    # transparent front door routes by magic and passes raw through
    assert decompress_transparent(z, 1 << 20) == data
    assert decompress_transparent(b"raw bytes", 1 << 20) == b"raw bytes"


def test_caps_trigger_before_materialization():
    bomb_src = b"\x00" * 1_000_000
    for comp, decomp in (
        (zstd_compress, zstd_decompress),
        (snappy_compress, snappy_decompress),
    ):
        blob = comp(bomb_src)
        assert len(blob) < 50_000  # it really is a bomb (snappy ~21:1)
        with pytest.raises(ValueError, match="zip-bomb"):
            decomp(blob, 100_000)
        # exactly at the cap passes
        assert len(decomp(blob, 1_000_000)) == 1_000_000


def test_corruption_fuzz_never_escapes():
    """Bit flips, truncations and junk over both codecs: every failure
    is ValueError (the walker-quarantine contract), never an OSError /
    pyarrow type / worker death."""
    data = b"hello world " * 300
    rng = random.Random(7)
    for comp, decomp in (
        (zstd_compress, zstd_decompress),
        (snappy_compress, snappy_decompress),
    ):
        blob = bytearray(comp(data))
        for t in range(600):
            k = t % 3
            if k == 0:
                b = bytearray(blob)
                i = rng.randrange(len(b))
                b[i] ^= 1 + rng.randrange(255)
                d = bytes(b)
            elif k == 1:
                d = bytes(blob[: rng.randrange(len(blob))])
            else:
                d = bytes(
                    rng.randrange(256) for _ in range(rng.randrange(60))
                )
            try:
                decomp(d, 1 << 20)
            except ValueError:
                pass  # quarantine


def test_multi_member_concatenations_inflate_fully():
    """pigz/bgzip-style member concatenation (r12 catch: the
    single-object form returned ONLY the first member — silent
    truncation): all four codecs inflate fully; trailing garbage and
    cross-member cap overruns quarantine."""
    import bz2
    import lzma
    import zlib

    def gz(x):
        co = zlib.compressobj(9, zlib.DEFLATED, 31)
        return co.compress(x) + co.flush()

    assert decompress_transparent(gz(b"a ") + gz(b"b"), 1 << 20) == b"a b"
    assert (
        decompress_transparent(bz2.compress(b"x") + bz2.compress(b"y"), 1 << 20)
        == b"xy"
    )
    assert (
        decompress_transparent(
            lzma.compress(b"p") + lzma.compress(b"q"), 1 << 20
        )
        == b"pq"
    )
    assert (
        decompress_transparent(
            zstd_compress(b"m") + zstd_compress(b"n"), 1 << 20
        )
        == b"mn"
    )
    with pytest.raises(ValueError, match="trailing garbage"):
        decompress_transparent(gz(b"a") + b"not gzip", 1 << 20)
    with pytest.raises(ValueError, match="zip-bomb"):
        decompress_transparent(gz(b"x" * 600) + gz(b"y" * 600), 1000)
    # exactly at the cap across members passes
    assert (
        len(decompress_transparent(gz(b"x" * 600) + gz(b"y" * 400), 1000))
        == 1000
    )


# ---------------------------------------------------------------------------
# snappy FRAMING format (.sz, r13)
# ---------------------------------------------------------------------------


def test_sz_golden_chunk_bytes():
    """Hand-assembled per framing_format.txt with the PUBLIC CRC-32C
    check value (crc32c('123456789') = 0xE3069283) — pins the chunk
    layout, the CRC variant AND the mask formula independently of the
    encoder's own arithmetic."""
    from user_behavior_spark_pipeline_spark.operators.compress import (
        SNAPPY_FRAME_MAGIC,
        _crc32c,
        _mask_crc32c,
        snappy_framed_decompress,
    )

    body = b"123456789"
    assert _crc32c(body) == 0xE3069283
    masked = ((0xE3069283 >> 15) | (0xE3069283 << 17)) + 0xA282EAD8
    masked &= 0xFFFFFFFF
    assert _mask_crc32c(0xE3069283) == masked
    golden = (
        SNAPPY_FRAME_MAGIC
        # uncompressed data chunk: type 0x01, 3-byte LE length 4+9
        + b"\x01\x0d\x00\x00"
        + masked.to_bytes(4, "little")
        + body
    )
    assert snappy_framed_decompress(golden, 1 << 20) == body


def test_sz_roundtrip_both_chunk_types_and_concat():
    from user_behavior_spark_pipeline_spark.operators.compress import (
        snappy_framed_compress,
        snappy_framed_decompress,
    )

    compressible = b"la " * 50_000  # > 64 KiB -> multiple 0x00 chunks
    rnd = random.Random(3).randbytes(70_000)  # incompressible -> 0x01
    for data in (compressible, rnd, b""):
        assert (
            snappy_framed_decompress(snappy_framed_compress(data), 1 << 20)
            == data
        )
    # concatenated streams (repeated stream identifier) inflate fully,
    # and the transparent front door routes .sz by magic
    cat = snappy_framed_compress(b"one ") + snappy_framed_compress(b"two")
    assert decompress_transparent(cat, 1 << 20) == b"one two"


def test_sz_skippable_skipped_reserved_fatal():
    from user_behavior_spark_pipeline_spark.operators.compress import (
        snappy_framed_compress,
        snappy_framed_decompress,
    )

    base = snappy_framed_compress(b"payload")
    with_skip = base + b"\xfe\x05\x00\x00decoy"
    assert snappy_framed_decompress(with_skip, 1 << 20) == b"payload"
    with pytest.raises(ValueError, match="reserved unskippable"):
        snappy_framed_decompress(base + b"\x02\x01\x00\x00z", 1 << 20)


def test_sz_hostile_shapes_quarantine():
    from user_behavior_spark_pipeline_spark.operators.compress import (
        SNAPPY_FRAME_MAGIC,
        snappy_framed_compress,
        snappy_framed_decompress,
    )

    good = snappy_framed_compress(b"x" * 1000)
    with pytest.raises(ValueError, match="stream id"):
        snappy_framed_decompress(b"\xff\x06\x00\x00sNaPpX" + good[10:], 1 << 20)
    with pytest.raises(ValueError, match="truncated"):
        snappy_framed_decompress(good[:-3], 1 << 20)
    flipped = bytearray(good)
    flipped[-1] ^= 0xFF  # payload tail: CRC must catch it
    with pytest.raises(ValueError, match="CRC-32C|corrupt snappy"):
        snappy_framed_decompress(bytes(flipped), 1 << 20)
    with pytest.raises(ValueError, match="zip-bomb"):
        snappy_framed_decompress(snappy_framed_compress(b"y" * 500_000), 1000)
    # 600-trial corruption fuzz: ValueError or success, nothing else
    rng = random.Random(11)
    blob = bytearray(snappy_framed_compress(b"hello world " * 600))
    for t in range(600):
        k = t % 3
        if k == 0:
            b = bytearray(blob)
            b[rng.randrange(len(b))] ^= 1 + rng.randrange(255)
            d = bytes(b)
        elif k == 1:
            d = bytes(blob[: rng.randrange(len(blob))])
        else:
            d = SNAPPY_FRAME_MAGIC + bytes(
                rng.randrange(256) for _ in range(rng.randrange(60))
            )
        try:
            snappy_framed_decompress(d, 1 << 20)
        except ValueError:
            pass
