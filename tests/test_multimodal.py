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
    with pytest.raises(NotImplementedError):
        decode_real(b"\x89PNG", "image")


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
