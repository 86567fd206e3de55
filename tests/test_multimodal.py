"""Multimodal plumbing: deterministic stub decode, payload pruning, frame
sampling, resize planning, and the real-codec seam."""

from __future__ import annotations

import pytest

from user_behavior_spark_pipeline_spark.operators.multimodal import (
    decode_features,
    decode_real,
    media_metadata,
    resize_plan,
    sample_frames,
    synth_media,
)
from user_behavior_spark_pipeline_spark.plans import read_schemas
from user_behavior_spark_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return synth_media(load_table(spark, sf_dir, "documents")).cache()


def test_decode_is_deterministic_and_normalized(media):
    a = decode_features(media).toPandas().sort_values("media_id").reset_index(drop=True)
    b = decode_features(media).toPandas().sort_values("media_id").reset_index(drop=True)
    assert a.equals(b)
    feats = a["feat"].iloc[0]
    assert len(feats) == 16
    assert abs(sum(feats) - 1.0) < 1e-6  # normalized histogram


def test_metadata_projection_prunes_payload(spark, sf_dir, tmp_path):
    """A query touching only metadata never decodes payload bytes — the scan's
    ReadSchema excludes the binary column entirely."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "media")
    synth_media(load_table(spark, sf_dir, "documents")).write.parquet(out)
    meta_only = spark.read.parquet(out).select(
        "media_id", "kind", F.col("meta.width").alias("width")
    )
    schemas = " ".join(read_schemas(meta_only))
    assert "payload" not in schemas
    assert "width" in schemas


def test_frame_sampling_counts(media):
    frames = sample_frames(media, interval_ms=60000).toPandas()
    durations = {
        r["media_id"]: r["duration_ms"]
        for r in media.filter("kind = 'video'").select(
            "media_id", "meta.duration_ms"
        ).collect()
    }
    per_media = frames.groupby("media_id").size().to_dict()
    for mid, dur in durations.items():
        expected = (dur + 59999) // 60000
        assert per_media.get(mid, 0) == expected


def test_resize_preserves_aspect_and_bounds(media):
    plan = resize_plan(media, max_side=64).toPandas()
    assert (plan["target_width"] <= 64).all()
    assert (plan["target_height"] <= 64).all()
    assert ((plan["target_width"] == 64) | (plan["target_height"] == 64)).all()


def test_real_decoder_seam_raises(media):
    # JPEG (SOI + APP0 marker) is the remaining documented codec seam
    with pytest.raises(NotImplementedError):
        decode_real(b"\xff\xd8\xff\xe0\x00\x10JFIF", "image")
    # a PNG signature prefix alone is not a PNG
    with pytest.raises((NotImplementedError, ValueError)):
        decode_real(b"\x89PNG", "image")


def _png_encode(width, height, pixels, color_type, filters, split_idat=1):
    """Minimal in-test PNG writer (independent of the decoder under test):
    filters[r] picks the filter type applied to row r — the ENCODE
    direction of each of the five defined filters, so the decoder's
    defiltering is checked against hand-applied spec math, not against
    itself."""
    import struct
    import zlib

    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    stride = width * channels
    bpp = channels
    raw = bytearray()
    prev = bytes(stride)
    for r in range(height):
        line = bytes(pixels[r * stride : (r + 1) * stride])
        ft = filters[r]
        raw.append(ft)
        for i in range(stride):
            a = line[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                f = line[i]
            elif ft == 1:
                f = (line[i] - a) & 0xFF
            elif ft == 2:
                f = (line[i] - b) & 0xFF
            elif ft == 3:
                f = (line[i] - ((a + b) >> 1)) & 0xFF
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                f = (line[i] - pred) & 0xFF
            raw.append(f)
        prev = line

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    comp = zlib.compress(bytes(raw))
    step = max(1, len(comp) // split_idat)
    idats = b"".join(
        chunk(b"IDAT", comp[i : i + step]) for i in range(0, len(comp), step)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + idats
        + chunk(b"IEND", b"")
    )


def test_decode_real_png_byte_exact_all_filters():
    """8-bit PNG: every defined filter type (None/Sub/Up/Average/Paeth,
    one per row) must defilter back to the exact source pixels, for gray,
    RGB and RGBA, including an IDAT stream split mid-bytes across chunks."""
    import random

    rng = random.Random(7)
    for color_type, channels in ((0, 1), (2, 3), (6, 4)):
        w, h = 5, 5
        pixels = [rng.randrange(256) for _ in range(w * h * channels)]
        png = _png_encode(w, h, pixels, color_type, filters=[0, 1, 2, 3, 4])
        got = decode_real(png, "image")
        assert got == {
            "kind": "image",
            "width": w,
            "height": h,
            "maxval": 255,
            "channels": channels,
            "pixels": pixels,
        }, f"color_type={color_type}"
    # gray+alpha, every row Paeth, IDAT split into 7 chunks
    w, h = 4, 3
    pixels = [rng.randrange(256) for _ in range(w * h * 2)]
    png = _png_encode(w, h, pixels, 4, filters=[4, 4, 4], split_idat=7)
    got = decode_real(png, "image")
    assert got["channels"] == 2 and got["pixels"] == pixels


def test_decode_real_png_rejects_out_of_scope_and_malformed():
    """16-bit depth / palette / interlace are NotImplementedError (spec
    surface outside the stated seam scope); bad filter bytes and truncated
    chunks fail loudly with ValueError."""
    import struct
    import zlib

    def png_with_ihdr(bit_depth=8, color_type=0, interlace=0):
        ihdr = struct.pack(">IIBBBBB", 2, 1, bit_depth, color_type, 0, 0, interlace)

        def chunk(ctype, data):
            crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
            return (
                struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)
            )

        comp = zlib.compress(b"\x00\x01\x02")
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", comp)
            + chunk(b"IEND", b"")
        )

    for kwargs in (
        {"bit_depth": 16},
        {"color_type": 3},
        {"interlace": 1},
    ):
        with pytest.raises(NotImplementedError):
            decode_real(png_with_ihdr(**kwargs), "image")
    # filter byte 9 is malformed
    bad = _png_encode(2, 1, [1, 2], 0, filters=[0])
    comp = zlib.compress(b"\x09\x01\x02")
    crc = zlib.crc32(b"IDAT" + comp) & 0xFFFFFFFF
    bad_idat = struct.pack(">I", len(comp)) + b"IDAT" + comp + struct.pack(">I", crc)
    head, _, _tail = bad.partition(b"IDAT")
    raw_bad = head[:-4] + bad_idat + b"\x00\x00\x00\x00IEND" + struct.pack(
        ">I", zlib.crc32(b"IEND") & 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="filter"):
        decode_real(raw_bad, "image")
    # truncated mid-IDAT (cuts the IEND chunk plus the IDAT tail)
    good = _png_encode(2, 2, [1, 2, 3, 4], 0, filters=[0, 0])
    with pytest.raises(ValueError):
        decode_real(good[:-20], "image")


def test_decode_real_wav_byte_exact():
    """WAV/PCM round-trip: bytes written by the stdlib wave module decode
    to the exact sample list, rate, channels, and width (16-bit stereo +
    8-bit mono)."""
    import io
    import struct
    import wave

    # 16-bit little-endian stereo
    samples = [0, 1, -1, 32767, -32768, 12345, -12345, 7, -7, 100]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(struct.pack("<10h", *samples))
    got = decode_real(buf.getvalue(), "audio")
    assert got == {
        "kind": "audio",
        "sample_rate": 44100,
        "n_channels": 2,
        "sample_width": 2,
        "samples": samples,
    }
    # 8-bit mono (unsigned per the WAV spec)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(bytes([0, 127, 128, 255]))
    got = decode_real(buf.getvalue(), "audio")
    assert got["samples"] == [0, 127, 128, 255]
    assert got["sample_rate"] == 8000 and got["n_channels"] == 1


def test_decode_real_pgm_ppm_byte_exact():
    """Binary PGM/PPM: header with comments and multi-whitespace, raster
    whose first byte is '#' (0x23 — must NOT be eaten as a comment), and
    a 16-bit-maxval PGM (big-endian 2-byte samples)."""
    pixels = [0x23, 0, 255, 17, 42, 99]  # leading 0x23 is the trap
    pgm = b"P5 # comment\n  3\t2 # another\n255\n" + bytes(pixels)
    got = decode_real(pgm, "image")
    assert got == {
        "kind": "image",
        "width": 3,
        "height": 2,
        "maxval": 255,
        "channels": 1,
        "pixels": pixels,
    }
    rgb = [1, 2, 3, 250, 251, 252]  # 2x1 RGB
    ppm = b"P6\n2 1\n255\n" + bytes(rgb)
    got = decode_real(ppm, "image")
    assert (got["width"], got["height"], got["channels"]) == (2, 1, 3)
    assert got["pixels"] == rgb
    # 16-bit PGM: big-endian samples
    wide = b"P5\n2 1\n65535\n" + (1000).to_bytes(2, "big") + (65535).to_bytes(2, "big")
    got = decode_real(wide, "image")
    assert got["pixels"] == [1000, 65535] and got["maxval"] == 65535
    # truncated raster must fail loudly, not return short pixels
    with pytest.raises(ValueError, match="truncated"):
        decode_real(b"P5\n4 4\n255\n\x00\x01", "image")
