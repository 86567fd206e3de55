"""Protobuf wire-format walker (operators/protowire): the spec's own
varint/tag examples are the oracle (no protobuf library here)."""

from __future__ import annotations

import pytest

from user_behavior_spark_pipeline_spark.operators.protowire import (
    proto_fields,
    proto_varint_decode,
    proto_varint_encode,
    proto_wire_fields,
    synth_proto_bytes,
    synth_proto_media,
)


def test_varint_spec_examples_and_roundtrip():
    import random

    assert proto_varint_encode(1) == b"\x01"
    assert proto_varint_encode(150) == b"\x96\x01"
    assert proto_varint_encode(300) == b"\xac\x02"
    assert proto_varint_decode(b"\x96\x01", 0) == (150, 2)
    rng = random.Random(9)
    for _ in range(300):
        v = rng.randrange(0, 2**63)
        assert proto_varint_decode(proto_varint_encode(v), 0)[0] == v
    with pytest.raises(ValueError, match="truncated"):
        proto_varint_decode(b"\x80\x80", 0)
    with pytest.raises(ValueError, match="overlong"):
        proto_varint_decode(b"\x80" * 11 + b"\x01", 0)


def test_wire_walk_spec_message_and_closed_form():
    # the encoding doc's canonical example: field 1 varint 150
    assert list(proto_wire_fields(b"\x08\x96\x01")) == [(1, 0, "150", 0)]
    for did in (0, 1, 7, 999):
        rows = list(proto_wire_fields(synth_proto_bytes(did, "x")))
        d = {r[0]: r for r in rows}
        assert d[1][2] == str(did * 3)
        assert d[2][2] == f"doc {did}".encode().hex()
        assert d[3][2] == str(did * 7) and d[3][1] == 1
        assert d[4][2] == str(did % 1000) and d[4][1] == 5
        assert d[5][2] == str(did + 300)
        assert d[6][2] == "080" + str(did % 5)


def test_wire_rejections_and_operator(spark):
    with pytest.raises(ValueError, match="truncated"):
        list(proto_wire_fields(b"\x08"))
    with pytest.raises(ValueError, match="wire type 3"):
        list(proto_wire_fields(b"\x0b\x01"))
    with pytest.raises(ValueError, match="field number 0"):
        list(proto_wire_fields(b"\x00\x01"))
    with pytest.raises(ValueError, match="overruns"):
        list(proto_wire_fields(b"\x12\x08abc"))
    docs = spark.createDataFrame(
        [(i, "t") for i in range(4)], "doc_id long, text string"
    )
    rows = proto_fields(synth_proto_media(docs)).collect()
    assert len([r for r in rows if r.parse_error is None]) == 24
    broken = spark.createDataFrame(
        [(9, b"\x12\xff garbage")], "media_id long, payload binary"
    )
    (r,) = proto_fields(broken).collect()
    assert r.parse_error is not None
