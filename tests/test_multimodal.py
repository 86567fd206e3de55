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
