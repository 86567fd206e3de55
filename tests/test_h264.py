"""H.264 bitstream structure (operators/h264): exp-Golomb spec
vectors, emulation-prevention laws, crop arithmetic, framing
equivalence, quarantine discipline."""

from __future__ import annotations

import pytest

from user_behavior_spark_pipeline_spark.operators.h264 import (
    _BitReader,
    _BitWriter,
    _fixture_params,
    _pps_bytes,
    _sei_trap_bytes,
    _slice_bytes,
    _sps_bytes,
    ebsp_to_rbsp,
    h264_nal_rows,
    h264_nal_table,
    parse_avcc,
    parse_pps,
    parse_sps,
    rbsp_to_ebsp,
    split_annexb,
    synth_h264_media,
    synth_h264_stream,
)


def test_exp_golomb_spec_vectors():
    """ITU-T H.264 §9.1 Table 9-2: codeNum 0..8 bit strings, and the
    §9.1.1 signed mapping."""
    expected_ue = {
        0: "1",
        1: "010",
        2: "011",
        3: "00100",
        4: "00101",
        5: "00110",
        6: "00111",
        7: "0001000",
        8: "0001001",
    }
    for v, bits in expected_ue.items():
        w = _BitWriter()
        w.ue(v)
        assert "".join(map(str, w.bits)) == bits, v
    # Table 9-3: codeNum -> se value 0,1,-1,2,-2,3,-3
    w = _BitWriter()
    for sv in (0, 1, -1, 2, -2, 3, -3):
        w.se(sv)
    r = _BitReader(w.rbsp())
    assert [r.se() for _ in range(7)] == [0, 1, -1, 2, -2, 3, -3]


def test_emulation_prevention_laws():
    """§7.4.1: 0x0000 followed by 0x00/01/02/03 is escaped with 0x03;
    anything else passes through; removal inverts exactly."""
    cases = {
        b"\x00\x00\x00": b"\x00\x00\x03\x00",
        b"\x00\x00\x01": b"\x00\x00\x03\x01",
        b"\x00\x00\x02": b"\x00\x00\x03\x02",
        b"\x00\x00\x03": b"\x00\x00\x03\x03",
        b"\x00\x00\x04": b"\x00\x00\x04",
        b"\x00\x01\x00\x00\x01": b"\x00\x01\x00\x00\x03\x01",
        # end-of-data law (§7.4.1.1): an RBSP ending in 0x0000 (the
        # cabac_zero_word shape) takes a FINAL 0x03 — the NAL's last
        # byte may not be 0x00, and removal must strip a trailing
        # 0x000003 with nothing after it (round-15 review finding:
        # both directions previously required a following byte)
        b"\x00\x00\x00\x00": b"\x00\x00\x03\x00\x00\x03",
        b"\x01\x00\x00": b"\x01\x00\x00\x03",
    }
    for rbsp, ebsp in cases.items():
        assert rbsp_to_ebsp(rbsp) == ebsp, rbsp
        assert ebsp_to_rbsp(ebsp) == rbsp, rbsp
    # a 0x03 NOT preceded by 0x0000, or followed by >0x03, is data
    assert ebsp_to_rbsp(b"\x01\x03\x02") == b"\x01\x03\x02"
    assert ebsp_to_rbsp(b"\x00\x00\x03\x04") == b"\x00\x00\x03\x04"
    # legacy illegal-but-seen form (EBSP ending 0x00): still inverts
    assert ebsp_to_rbsp(b"\x00\x00\x03\x00\x00") == b"\x00\x00\x00\x00"


def test_sei_trap_forces_emulation_prevention():
    """The fixture SEI's RBSP embeds literal start-code prefixes; the
    framed Annex-B stream must contain start codes ONLY at NAL
    boundaries — i.e. exactly n_nals occurrences of 0x000001."""
    for doc in (0, 2, 8, 14):
        raw = synth_h264_stream(doc)
        n_nals = len(h264_nal_rows(raw))
        assert raw.count(b"\x00\x00\x01") == n_nals, doc
        # and the SEI RBSP really does carry the trap
        sei = split_annexb(raw)[2]
        assert b"\x00\x00\x01" in ebsp_to_rbsp(sei[1:])


def test_sps_crop_and_interlace_arithmetic():
    """§7.4.2.1.1: 4:2:0 crop units are 2 horizontally and
    2*(2 - frame_mbs_only_flag) vertically."""
    # k=3: progressive, crop_r=3, crop_b=1, w_mbs=43, hmu=23
    sps = parse_sps(ebsp_to_rbsp(_sps_bytes(_fixture_params(3))[1:]))
    assert sps["width"] == 43 * 16 - 2 * 3
    assert sps["height"] == 23 * 16 - 2 * 1
    # k=7: interlaced (frame_mbs_only 0) -> heights double per map unit
    p = _fixture_params(7)
    assert p["frame_mbs_only"] == 0
    sps = parse_sps(ebsp_to_rbsp(_sps_bytes(p)[1:]))
    assert sps["height"] == 32 * (20 + 7 % 6) - 4 * ((7 % 5) // 2)
    # k=0: high profile with a real scaling list to walk
    p = _fixture_params(0)
    assert p["profile"] == 100 and p["scaling_matrix"]
    sps = parse_sps(ebsp_to_rbsp(_sps_bytes(p)[1:]))
    assert sps["profile_idc"] == 100 and sps["width"] == 40 * 16


def test_framing_equivalence_annexb_vs_avcc():
    """The SAME NAL units framed as Annex-B and as avcC + 4-byte
    lengths parse to identical rows."""
    p = _fixture_params(6)
    nals = [
        _sps_bytes(p),
        _pps_bytes(),
        _sei_trap_bytes(p["k"]),
        _slice_bytes(p, True, 0),
        _slice_bytes(p, False, 1),
    ]
    annexb = bytearray()
    for i, nal in enumerate(nals):
        annexb += (b"\x00\x00\x00\x01" if i == 0 else b"\x00\x00\x01") + nal
    avcc = bytearray(bytes([1, p["profile"], 0, p["level"], 0xFF, 0xE1]))
    avcc += len(nals[0]).to_bytes(2, "big") + nals[0]
    avcc += bytes([1]) + len(nals[1]).to_bytes(2, "big") + nals[1]
    for nal in nals[2:]:
        avcc += len(nal).to_bytes(4, "big") + nal
    assert h264_nal_rows(bytes(annexb)) == h264_nal_rows(bytes(avcc))


def test_quarantine_shapes():
    with pytest.raises(ValueError, match="no Annex-B start code"):
        split_annexb(b"\x00\x00\x02\x00")
    with pytest.raises(ValueError, match="garbage before first"):
        split_annexb(b"\x07\x00\x00\x01\x65")
    with pytest.raises(ValueError, match="forbidden_zero_bit"):
        h264_nal_rows(b"\x00\x00\x01\xe7\x00")
    with pytest.raises(ValueError, match="configurationVersion"):
        parse_avcc(b"\x02\x42\x00\x1e\xff\xe1")
    with pytest.raises(ValueError, match="truncated avcC"):
        parse_avcc(bytes([1, 66, 0, 30, 0xFF, 0xE1, 0, 99]))
    # FMO quarantines by name
    w = _BitWriter()
    w.ue(0).ue(0).u(0, 1).u(0, 1).ue(1)
    with pytest.raises(ValueError, match="FMO slice groups"):
        parse_pps(w.rbsp())
    # a slice referencing an unknown PPS
    p = _fixture_params(1)
    bad = b"\x00\x00\x01" + _sps_bytes(p) + b"\x00\x00\x01" + _slice_bytes(
        p, True, 0
    )
    with pytest.raises(ValueError, match="unknown PPS"):
        h264_nal_rows(bad)


def test_nal_table_quarantines_per_doc(spark):
    """One corrupt payload -> ONE parse_error row; healthy docs
    unaffected (the walker discipline)."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "payload": [synth_h264_stream(1), b"\x00\x00\x02junk"],
        }
    )
    rows = h264_nal_table(spark.createDataFrame(pdf)).collect()
    bad = [r for r in rows if r["parse_error"] is not None]
    assert len(bad) == 1 and bad[0]["doc_id"] == 2
    assert "start code" in bad[0]["parse_error"]
    good = [r for r in rows if r["doc_id"] == 1]
    assert len(good) == 4 + 1 % 4 + 1


def test_media_synth_spark_roundtrip(spark):
    """End-to-end through the Spark operators at a small slice."""
    docs = spark.range(0, 24).withColumnRenamed("id", "doc_id")
    out = h264_nal_table(synth_h264_media(docs))
    sps_rows = out.filter("nal_type = 7").collect()
    assert len(sps_rows) == 24
    for r in sps_rows:
        k = r["doc_id"] % 24
        assert r["width"] == 16 * (40 + k % 8) - 2 * (k % 5)
