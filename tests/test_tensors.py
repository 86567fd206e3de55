"""NPY/NPZ ingestion (operators/tensors): two-sided cross-check against
numpy's own writer/reader, closed-form fixture laws, quarantine."""

from __future__ import annotations

import io

import numpy as np
import pytest

from user_behavior_spark_pipeline_spark.operators.tensors import (
    _iter_npy_members,
    npy_decode,
    npy_encode,
    npy_values,
    synth_npz_bytes,
    synth_npz_media,
)


def test_npy_decode_reads_numpy_writes():
    """numpy writes, our decoder reads: dtypes x shapes x orders."""
    rng = np.random.default_rng(5)
    for dt in ("<f4", ">f8", "<i4", ">i8", "|u1", "<i2", "|b1"):
        for shape in ((0,), (5,), (3, 4), (2, 3, 4)):
            a = rng.integers(0, 100, size=shape).astype(np.dtype(dt))
            if dt == "|b1":
                a = a % 2 > 0
            for fortran in (False, True):
                buf = io.BytesIO()
                np.save(buf, np.asfortranarray(a) if fortran else a)
                d = npy_decode(buf.getvalue())
                assert d["shape"] == list(shape)
                assert np.array_equal(d["values"].reshape(shape), a), (
                    dt,
                    shape,
                    fortran,
                )


def test_npy_encode_read_by_numpy():
    """our encoder writes, numpy reads — including Fortran order, whose
    C-order flatten must still be row-major."""
    for dt in ("<f4", ">i8", "|u1"):
        for fortran in (False, True):
            b = npy_encode([1, 2, 3, 4, 5, 6], (2, 3), dt, fortran)
            a = np.load(io.BytesIO(b))
            assert a.shape == (2, 3)
            assert a.ravel().tolist() == [1, 2, 3, 4, 5, 6], (dt, fortran)
            assert np.isfortran(a) == fortran or a.size == 0


def test_npz_fixture_closed_form_and_numpy_crosscheck():
    for did in (0, 1, 7, 12):
        raw = synth_npz_bytes(did)
        z = np.load(io.BytesIO(raw))
        n = did % 5 + 3
        assert z["emb.npy"].tolist() == [
            float((did * 7 + j) % 100) for j in range(n)
        ]
        assert z["ids.npy"].tolist() == [
            [did, did + 1],
            [did + 2, did + 3],
        ]
        assert set(dict(_iter_npy_members(raw))) == {"emb.npy", "ids.npy"}


def test_npy_rejections_quarantine_shaped():
    with pytest.raises(ValueError, match="format version"):
        npy_decode(b"\x93NUMPY\x09\x00" + b"\x00" * 20)
    with pytest.raises(ValueError, match="bad magic"):
        npy_decode(b"not a tensor")
    buf = io.BytesIO()
    np.save(buf, np.array(["a", "b"]))
    with pytest.raises(ValueError, match="out of scope"):
        npy_decode(buf.getvalue())
    good = npy_encode([1, 2, 3, 4], (2, 2), "<i4")
    with pytest.raises(ValueError, match="truncated"):
        npy_decode(good[:-3])
    # structured dtype (list descr) rejects, not pickles
    buf = io.BytesIO()
    np.save(buf, np.zeros(2, dtype=[("a", "<i4"), ("b", "<f4")]))
    with pytest.raises(ValueError, match="structured|out of scope"):
        npy_decode(buf.getvalue())


def test_npy_values_operator_and_quarantine(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(4)], "doc_id long"
    )
    rows = npy_values(synth_npz_media(docs)).collect()
    good = [r for r in rows if r.parse_error is None]
    by_doc = {}
    for r in good:
        by_doc.setdefault(r.media_id, []).append(r)
    for d in range(4):
        n = d % 5 + 3
        assert len(by_doc[d]) == n + 4
        emb = sorted(
            (r for r in by_doc[d] if r.member == "emb.npy"),
            key=lambda r: r.value_idx,
        )
        assert [r.value for r in emb] == [
            repr(float((d * 7 + j) % 100)) for j in range(n)
        ]
    broken = spark.createDataFrame(
        [(9, b"\x93NUMPY\x01\x00\xff\xff garbage")],
        "media_id long, payload binary",
    )
    (r,) = npy_values(broken).collect()
    assert r.parse_error is not None and r.value is None


def test_sniffer_routes_tensor_and_avro_payloads():
    from user_behavior_spark_pipeline_spark.operators.avro import (
        synth_avro_bytes,
    )
    from user_behavior_spark_pipeline_spark.operators.multimodal import (
        sniff_media_type,
    )

    assert sniff_media_type(npy_encode([1], (1,), "<i4")) == "npy"
    assert sniff_media_type(synth_npz_bytes(3)) == "zip"
    assert sniff_media_type(synth_avro_bytes(3)) == "avro"
