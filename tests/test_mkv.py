"""Matroska/WebM demux (operators/mkv): EBML vint laws from spec
arithmetic, hand-built elements independent of the builder, closed-form
roundtrip, unknown-size Segment, quarantine."""

from __future__ import annotations

import struct

import pytest

from user_behavior_spark_pipeline_spark.operators.mkv import (
    _ebml_children,
    _vint,
    mkv_demux,
    mkv_tracks,
    synth_mkv_bytes,
    synth_mkv_media,
)


def test_ebml_vint_widths_spec_examples():
    """VINT width law: leading zeros of the first byte select 1-8
    bytes; IDs keep the marker, sizes strip it; all-ones size means
    unknown."""
    # 1-byte: 0x81 -> size 1, id 0x81
    assert _vint(b"\x81", 0, keep_marker=False) == (1, 1)
    assert _vint(b"\x81", 0, keep_marker=True) == (0x81, 1)
    # 2-byte: 0x4282 -> size 0x282, id kept on the wire
    assert _vint(b"\x42\x82", 0, keep_marker=False) == (0x282, 2)
    assert _vint(b"\x42\x82", 0, keep_marker=True) == (0x4282, 2)
    # 4-byte id (Segment)
    assert _vint(b"\x18\x53\x80\x67", 0, keep_marker=True) == (
        0x18538067,
        4,
    )
    # unknown size: all value bits set
    assert _vint(b"\xff", 0, keep_marker=False) == (None, 1)
    assert _vint(b"\x7f\xff", 0, keep_marker=False) == (None, 2)
    # but 0x7f00 is a KNOWN 2-byte size
    assert _vint(b"\x7f\x00", 0, keep_marker=False) == (0x3F00, 2)
    with pytest.raises(ValueError, match="zero marker"):
        _vint(b"\x00\x01", 0, keep_marker=False)
    with pytest.raises(ValueError, match="truncated"):
        _vint(b"\x40", 0, keep_marker=False)


def test_ebml_children_hand_built():
    """A hand-assembled parent with two children, one nested — no
    builder involved."""
    inner = b"\xd7\x81\x05"  # TrackNumber(0xD7), size 1, value 5
    parent = b"\xae" + bytes([0x80 | len(inner)]) + inner
    kids = list(_ebml_children(parent, 0, len(parent)))
    assert kids == [(0xAE, 2, 2 + len(inner))]
    inner_kids = list(_ebml_children(parent, 2, 2 + len(inner)))
    assert inner_kids == [(0xD7, 4, 5)]
    with pytest.raises(ValueError, match="overruns"):
        list(_ebml_children(b"\xd7\x85\x01", 0, 3))


def test_mkv_closed_form_both_segment_size_forms():
    for did in range(8):
        for unk in (False, True):
            d = mkv_demux(synth_mkv_bytes(did, unknown_size_segment=unk))
            secs, nc = did % 3 + 1, did % 2 + 1
            assert d["doc_type"] == "webm"
            assert d["duration_ms"] == 1000 * secs
            v, a = d["tracks"]
            assert (v["codec_id"], v["width"], v["height"]) == (
                "V_VP9",
                320,
                240 + 8 * (did % 4),
            )
            assert (a["codec_id"], a["sample_rate"], a["channels"]) == (
                "A_OPUS",
                48000,
                2,
            )
            assert v["n_blocks"] == 4 * nc
            assert v["n_keyframes"] == nc + (nc + 1) // 2
            assert a["n_blocks"] == a["n_keyframes"] == 2 * nc


def test_mkv_corruption_quarantine_shapes():
    good = synth_mkv_bytes(2)
    with pytest.raises(ValueError, match="overruns|truncated"):
        mkv_demux(good[:-5])
    with pytest.raises(ValueError, match="zero marker|EBML"):
        mkv_demux(b"\x00garbage")
    with pytest.raises(ValueError, match="missing header"):
        mkv_demux(b"\xae\x81\x00")
    # a Cluster block naming an undeclared track is structural damage
    from user_behavior_spark_pipeline_spark.operators.mkv import (
        _CLUSTER,
        _EBML_HEADER,
        _SEGMENT,
        _SIMPLE_BLOCK,
        _el,
    )

    hdr = _el(_EBML_HEADER, b"")
    blk = _el(_SIMPLE_BLOCK, b"\x83" + struct.pack(">h", 0) + b"\x80")
    seg = _el(_SEGMENT, _el(_CLUSTER, blk))
    with pytest.raises(ValueError, match="Tracks|undeclared"):
        mkv_demux(hdr + seg)
    # sniffer routes EBML
    from user_behavior_spark_pipeline_spark.operators.multimodal import (
        sniff_media_type,
    )

    assert sniff_media_type(good) == "mkv"


def test_mkv_tracks_operator_quarantines(spark):
    docs = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    rows = mkv_tracks(synth_mkv_media(docs)).collect()
    good = [r for r in rows if r.parse_error is None]
    assert len(good) == 8  # two tracks per document
    broken = spark.createDataFrame(
        [(9, b"\x1a\x45\xdf\xa3 torn")], "media_id long, payload binary"
    )
    (r,) = mkv_tracks(broken).collect()
    assert r.parse_error is not None and r.codec_id is None
