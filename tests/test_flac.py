"""FLAC decode (operators/flac): public CRC check values, a
hand-assembled golden frame, lossless roundtrip across every
subframe/stereo path, corruption quarantine."""

from __future__ import annotations

import pytest

from user_behavior_spark_pipeline_spark.operators.flac import (
    _Bits,
    _BitsW,
    _fixture_pcm,
    crc8,
    crc16,
    flac_audio_stats,
    flac_decode,
    synth_flac_bytes,
    synth_flac_media,
)


def test_crc_public_check_values():
    """CRC-8 poly 0x07 (SMBUS) and CRC-16 poly 0x8005 init 0
    (BUYPASS): the standard '123456789' check values pin both
    polynomials against the outside world."""
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8
    assert crc8(b"") == 0 and crc16(b"") == 0


def _golden_mono_constant() -> bytes:
    """A hand-assembled minimal stream: STREAMINFO (mono, 16-bit,
    blocksize 192, 192 total samples) + ONE frame with a CONSTANT
    subframe of value -5. Every byte below is written out by hand so
    the decoder is pinned to the spec, not to our own writer."""
    w = _BitsW()
    w.u(192, 16).u(192, 16).u(0, 24).u(0, 24)
    w.u(44100, 20).u(0, 3).u(15, 5).u(192, 36)
    info = w.to_bytes() + bytes(16)
    out = b"fLaC" + bytes([0x80]) + len(info).to_bytes(3, "big") + info
    # frame header: sync 11111111111110, res 0, fixed-block 0,
    # blocksize code 1 (192), rate code 9 (44100), channels code 0
    # (mono), depth code 100 (16-bit), res 0, frame number 0x00
    hdr = bytes([0xFF, 0xF8, 0x19, 0x08, 0x00])
    hdr += bytes([crc8(hdr)])
    # subframe: pad 0, type 000000 (constant), wasted 0 -> one byte
    # 0x00; then the 16-bit value -5 = 0xFFFB
    body = bytes([0x00, 0xFF, 0xFB])
    frame = hdr + body
    return out + frame + crc16(frame).to_bytes(2, "big")


def test_golden_hand_assembled_frame():
    d = flac_decode(_golden_mono_constant())
    assert d["sample_rate"] == 44100
    assert d["n_channels"] == 1 and d["depth"] == 16
    assert d["channels"][0] == [-5] * 192


def test_lossless_roundtrip_all_rotations():
    """Every k = doc %% 16 exercises a distinct (subframe kinds,
    stereo mode, partition order) combination; decode must reproduce
    the waveform EXACTLY."""
    for doc in range(16):
        d = flac_decode(synth_flac_bytes(doc))
        left, right = _fixture_pcm(doc)
        assert d["channels"][0] == left, doc
        assert d["channels"][1] == right, doc


def test_rice_escape_partition_decodes():
    """An escape-coded partition (param all-ones -> 5-bit raw size,
    two's-complement residuals) through the residual reader."""
    from user_behavior_spark_pipeline_spark.operators.flac import (
        _read_residual,
    )

    w = _BitsW()
    w.u(0, 2)  # method 0
    w.u(0, 4)  # partition order 0
    w.u(15, 4)  # escape
    w.u(6, 5)  # 6 raw bits per residual
    for v in (-3, 0, 7, -17):
        w.s(v, 6)
    w.align()
    out = _read_residual(_Bits(w.to_bytes()), 4, 0)
    assert out == [-3, 0, 7, -17]
    # raw size 0 means all-zero residuals
    w = _BitsW()
    w.u(0, 2).u(0, 4).u(15, 4).u(0, 5)
    w.align()
    assert _read_residual(_Bits(w.to_bytes()), 3, 0) == [0, 0, 0]


def test_wasted_bits_unpack():
    """wasted-bits flag shifts every decoded sample left; the value
    is coded as unary count minus one."""
    from user_behavior_spark_pipeline_spark.operators.flac import (
        _read_subframe,
    )

    w = _BitsW()
    w.u(0, 1).u(1, 6)  # verbatim
    w.u(1, 1).unary(1)  # wasted bits = 2
    for v in (1, -2, 3):
        w.s(v, 14)  # depth 16 - 2 wasted
    w.align()
    assert _read_subframe(_Bits(w.to_bytes()), 3, 16) == [4, -8, 12]


def test_corruption_quarantines():
    good = synth_flac_bytes(1)
    with pytest.raises(ValueError, match="fLaC magic"):
        flac_decode(b"RIFF" + good[4:])
    # flip a PCM-bearing bit near the end: some CRC must catch it
    bad = bytearray(good)
    bad[-40] ^= 0x10
    with pytest.raises(ValueError, match="CRC"):
        flac_decode(bytes(bad))
    # truncation mid-frame
    with pytest.raises(ValueError):
        flac_decode(good[:-30])
    # STREAMINFO missing
    no_info = b"fLaC" + bytes([0x81, 0, 0, 1, 0]) + good[42:]
    with pytest.raises(ValueError):
        flac_decode(no_info)


def test_stats_operator_and_quarantine_row(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [3, 4],
            "payload": [synth_flac_bytes(3), b"fLaC\x00junk"],
        }
    )
    rows = {
        r["doc_id"]: r
        for r in flac_audio_stats(spark.createDataFrame(pdf)).collect()
    }
    L, R = _fixture_pcm(3)
    ok = rows[3]
    assert ok["n_samples"] == 512 and ok["sample_rate"] == 44100
    assert ok["ch0_sum"] == sum(L) and ok["ch1_sum"] == sum(R)
    assert ok["abs_sum"] == sum(map(abs, L)) + sum(map(abs, R))
    assert ok["square_sum"] == sum(v * v for v in L + R)
    assert rows[4]["parse_error"] is not None


def test_media_synth_spark_roundtrip(spark):
    docs = spark.range(0, 16).withColumnRenamed("id", "doc_id")
    out = flac_audio_stats(synth_flac_media(docs)).collect()
    assert len(out) == 16 and all(r["parse_error"] is None for r in out)
