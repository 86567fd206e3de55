"""Trainer-handoff WRITE side (operators/trainer_export): packing law
vs a local reference, disk roundtrip through binaryFile, format
cross-checks against numpy/tarfile as independent readers."""

from __future__ import annotations

import io
import tarfile

import numpy as np
import pytest

from user_behavior_spark_pipeline_spark.operators.trainer_export import (
    packed_sample_stats,
    write_packed_shards,
)

SF = "/root/testdata/sf0.001"


def _local_reference(spark, sf_dir, window=128):
    """Per-sample (shard, sample_id, n_tok, tok_sum) computed with
    plain Python — independent of both the writer and the oracle."""
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source", "doc_id", "text")
        .collect()
    )
    streams: dict[str, list[int]] = {}
    for r in sorted(rows, key=lambda r: (r["source"], r["doc_id"])):
        if r["text"]:
            streams.setdefault(r["source"], []).extend(
                ord(c) for c in r["text"]
            )
    out = {}
    for shard, toks in streams.items():
        for i in range(0, len(toks), window):
            seg = toks[i : i + window]
            out[(shard, i // window)] = (len(seg), sum(seg))
    return out


@pytest.mark.parametrize("fmt", ["tar", "npz"])
def test_roundtrip_matches_local_reference(spark, fmt):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    shards = write_packed_shards(docs, 128, 8, fmt=fmt)
    got = {
        (r["shard"], r["sample_id"]): (r["n_tok"], r["tok_sum"])
        for r in packed_sample_stats(shards, fmt=fmt).collect()
    }
    assert got == _local_reference(spark, SF)


def test_disk_roundtrip_binary_file(spark, tmp_path):
    """The payload rows ARE files: write each tar shard to disk from
    the executor side, read back via binaryFile + the certified
    reader — the full handoff a trainer host performs."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    shards = write_packed_shards(docs, 128, 8, fmt="tar").collect()
    for r in shards:
        (tmp_path / f"{r['shard']}-{r['file_id']:05d}.tar").write_bytes(
            bytes(r["payload"])
        )
    back = spark.read.format("binaryFile").load(
        str(tmp_path) + "/*.tar"
    ).select(
        F_regexp("path"), "content"
    )
    got = {
        (r["shard"], r["sample_id"]): (r["n_tok"], r["tok_sum"])
        for r in packed_sample_stats(
            back.withColumnRenamed("content", "payload"), fmt="tar"
        ).collect()
    }
    assert got == _local_reference(spark, SF)


def F_regexp(col):
    from pyspark.sql import functions as F

    return F.regexp_extract(
        F.reverse(F.split(col, "/")).getItem(0), r"^(.*)-\d+\.tar$", 1
    ).alias("shard")


def test_tar_shards_read_by_stdlib_tarfile():
    """tarfile (independent reader) accepts the written archive and
    sees the same members; numpy.load accepts each tokens.npy."""
    import pandas as pd

    from user_behavior_spark_pipeline_spark.operators.trainer_export import (
        _tar_shard_bytes,
    )

    ids = [0, 1, 2]
    samples = [np.arange(5, dtype=np.int32) * (i + 1) for i in ids]
    blob = _tar_shard_bytes("s0", ids, samples)
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        names = tf.getnames()
        assert names == [
            n for i in ids for n in (
                f"s0/{i:08d}.tokens.npy", f"s0/{i:08d}.meta.json"
            )
        ]
        for i in ids:
            arr = np.load(
                io.BytesIO(tf.extractfile(f"s0/{i:08d}.tokens.npy").read())
            )
            assert np.array_equal(arr, samples[i])
    del pd


def test_npz_shards_read_by_numpy():
    """numpy.load (independent reader) opens the NPZ and recovers the
    padded matrix, lengths and ids exactly."""
    from user_behavior_spark_pipeline_spark.operators.trainer_export import (
        _npz_shard_bytes,
    )

    samples = [
        np.array([3, 1, 4], dtype=np.int32),
        np.arange(8, dtype=np.int32),
    ]
    blob = _npz_shard_bytes(8, [10, 11], samples)
    z = np.load(io.BytesIO(blob))
    assert z["tokens"].shape == (2, 8)
    assert z["tokens"][0].tolist() == [3, 1, 4, 0, 0, 0, 0, 0]
    assert z["lengths"].tolist() == [3, 8]
    assert z["sample_ids"].tolist() == [10, 11]
    # byte-identical on rebuild (deterministic ZIP)
    assert _npz_shard_bytes(8, [10, 11], samples) == blob


def test_boundary_docs_feed_both_files(spark):
    """A document crossing a file boundary contributes its exact token
    slices to BOTH files — total tokens conserve and every non-tail
    sample is full."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "source": ["a"] * 3,
            "doc_id": [1, 2, 3],
            # windows=4, samples_per_file=2 -> span 8; doc 2 crosses it
            "text": ["xxxxx", "yyyyyy", "zz"],
        }
    )
    docs = spark.createDataFrame(pdf)
    shards = write_packed_shards(docs, 4, 2, fmt="npz")
    rows = {r["file_id"]: r for r in shards.collect()}
    assert {0: (2, 8), 1: (2, 5)} == {
        k: (r["n_samples"], r["n_tokens"]) for k, r in rows.items()
    }
    stats = packed_sample_stats(shards, fmt="npz").collect()
    total = sum(r["n_tok"] for r in stats)
    assert total == 13
    by_id = {r["sample_id"]: r["n_tok"] for r in stats}
    assert by_id == {0: 4, 1: 4, 2: 4, 3: 1}
    # content law: sample 1 spans the doc-1/doc-2 boundary
    exp = [ord(c) for c in "xxxxxyyyyyyzz"]
    sums = {r["sample_id"]: r["tok_sum"] for r in stats}
    for sid in range(4):
        assert sums[sid] == sum(exp[sid * 4 : (sid + 1) * 4])


def test_bad_format_rejected(spark):
    docs = spark.range(0)
    with pytest.raises(ValueError, match="unknown trainer shard format"):
        write_packed_shards(docs, fmt="zip")
    with pytest.raises(ValueError, match="unknown trainer shard format"):
        packed_sample_stats(docs, fmt="zip")


def test_epoch_shuffle_permutation_laws(spark):
    """Each (epoch, shard) gets a bijective 0..n-1 position; the
    permutation differs across epochs; repartitioning does not change
    any position (key-addressed determinism)."""
    from user_behavior_spark_pipeline_spark.operators.trainer_export import (
        epoch_shuffle,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = epoch_shuffle(docs).collect()
    by_key = {}
    for r in out:
        by_key.setdefault((r["epoch"], r["shard"]), []).append(
            (r["pos"], r["doc_id"])
        )
    for (epoch, shard), pairs in by_key.items():
        poss = sorted(p for p, _ in pairs)
        assert poss == list(range(len(pairs))), (epoch, shard)
    # epoch 1 and 2 order the same shard differently (overwhelmingly)
    e1 = {(r["shard"], r["doc_id"]): r["pos"] for r in out if r["epoch"] == 1}
    e2 = {(r["shard"], r["doc_id"]): r["pos"] for r in out if r["epoch"] == 2}
    assert e1.keys() == e2.keys()
    assert any(e1[k] != e2[k] for k in e1)
    # partitioning-independence
    out2 = epoch_shuffle(docs.repartition(7)).collect()
    assert {(r["epoch"], r["shard"], r["doc_id"], r["pos"]) for r in out} == {
        (r["epoch"], r["shard"], r["doc_id"], r["pos"]) for r in out2
    }


def test_tar_roundtrip_with_dotted_source_name(spark):
    """A '.' inside the source (shard) name must not shear the member
    key: member names are '{source}/{seq}.tokens.npy', and splitting on
    the FIRST dot paired nothing — both lookup dicts stayed empty, the
    unpaired-members guard passed vacuously, and the readback silently
    emitted ZERO rows (round-15 review finding, reproduced)."""
    docs = spark.createDataFrame(
        [("web.en", 1, "ab cd"), ("web.en", 2, "ef"), ("plain", 3, "gh")],
        "source string, doc_id long, text string",
    )
    shards = write_packed_shards(docs, 4, 8, fmt="tar")
    rows = packed_sample_stats(shards, fmt="tar").collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], 0)
        by_shard[r["shard"]] += r["n_tok"]
    assert by_shard.get("web.en", 0) > 0, rows
    assert by_shard.get("plain", 0) > 0, rows
    # token conservation per shard: every input char lands in a sample
    assert by_shard["web.en"] == len("ab cd") + len("ef")
    assert by_shard["plain"] == len("gh")
