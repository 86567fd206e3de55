"""Arrow IPC ingestion (operators/arrow_ipc): pyarrow is the decoder
(the reference implementation, first-party here); tests own the
contract — both framings, canonical values, schema scoping, quarantine."""

from __future__ import annotations

import pytest

from user_behavior_spark_pipeline_spark.operators.arrow_ipc import (
    arrow_ipc_records,
    arrow_ipc_rows,
    synth_arrow_bytes,
    synth_arrow_media,
)


def test_arrow_both_framings_closed_form():
    for did in (0, 1, 2, 3, 4, 5, 11):
        rows = list(arrow_ipc_rows(synth_arrow_bytes(did)))
        n = did % 3 + 1
        assert len(rows) == n * 5
        got = {(ri, f): (t, v) for ri, f, t, v in rows}
        for i in range(n):
            assert got[(i, "id")] == ("long", str(did * 10 + i))
            assert got[(i, "kind")] == ("string", f"k{i % 2}")
            assert got[(i, "score")] == ("double", repr((did * 2 + i) * 0.5))
            assert got[(i, "flag")] == (
                "boolean", "true" if i % 2 == 0 else "false")
            assert got[(i, "note")] == (
                ("null", None) if i % 3 == 0 else ("string", f"n{i}"))
    # file format really is Feather v2 (ARROW1 magic), stream is not
    assert synth_arrow_bytes(1)[:6] == b"ARROW1"
    assert synth_arrow_bytes(0)[:6] != b"ARROW1"


def test_arrow_rejections_and_scoping():
    import pyarrow as pa

    with pytest.raises(ValueError, match="corrupt Arrow"):
        list(arrow_ipc_rows(b"ARROW1\x00\x00garbage"))
    with pytest.raises(ValueError, match="corrupt Arrow"):
        list(arrow_ipc_rows(b"\xff\xff\xff\xff\x30\x00\x00\x00junk"))
    sink = pa.BufferOutputStream()
    t = pa.table({"a": pa.array([[1, 2]], pa.list_(pa.int64()))})
    w = pa.ipc.new_stream(sink, t.schema)
    for b in t.to_batches():
        w.write_batch(b)
    w.close()
    with pytest.raises(ValueError, match="out of scope"):
        list(arrow_ipc_rows(sink.getvalue().to_pybytes()))


def test_arrow_operator_quarantines(spark):
    docs = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    rows = arrow_ipc_records(synth_arrow_media(docs)).collect()
    good = [r for r in rows if r.parse_error is None]
    assert len(good) == sum((d % 3 + 1) * 5 for d in range(5))
    broken = spark.createDataFrame(
        [(9, b"ARROW1\x00\x00 torn")], "media_id long, payload binary"
    )
    (r,) = arrow_ipc_records(broken).collect()
    assert r.parse_error is not None


def test_sniffer_routes_bz2_xz():
    import bz2 as bz2mod
    import lzma

    from user_behavior_spark_pipeline_spark.operators.multimodal import (
        sniff_media_type,
    )

    assert sniff_media_type(bz2mod.compress(b"x" * 100)) == "bz2"
    assert sniff_media_type(lzma.compress(b"x" * 100)) == "xz"
