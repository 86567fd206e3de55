"""Iceberg manifest replay: nested-record Avro decode, snapshot
selection, DELETED-status filtering, quarantine composure."""

from __future__ import annotations

import json

import pytest

from user_behavior_spark_pipeline_spark.operators.avro import (
    avro_container_records,
    build_avro_container,
    zigzag_encode,
)
from user_behavior_spark_pipeline_spark.operators.iceberg import (
    _file_numbers,
    avro_rows_keyed,
    iceberg_live_files,
    synth_iceberg_manifests,
    synth_iceberg_metadata,
    synth_iceberg_rows,
)


def test_nested_record_decode_flattens_dotted():
    schema = json.dumps(
        {
            "type": "record",
            "name": "outer",
            "fields": [
                {"name": "a", "type": "long"},
                {
                    "name": "mid",
                    "type": {
                        "type": "record",
                        "name": "mid",
                        "fields": [
                            {"name": "b", "type": "string"},
                            {
                                "name": "inner",
                                "type": {
                                    "type": "record",
                                    "name": "inner",
                                    "fields": [
                                        {"name": "c", "type": "boolean"}
                                    ],
                                },
                            },
                        ],
                    },
                },
            ],
        }
    ).encode()
    body = (
        zigzag_encode(7)
        + zigzag_encode(2)
        + b"hi"
        + b"\x01"
    )
    buf = build_avro_container(schema, [body], bytes(range(16)))
    rows = list(avro_container_records(buf))
    assert rows == [
        (0, "a", "long", "7"),
        (0, "mid.b", "string", "hi"),
        (0, "mid.inner.c", "boolean", "true"),
    ]


def test_nested_record_depth_cap_rejects():
    t = "long"
    for i in range(20):
        t = {
            "type": "record",
            "name": f"r{i}",
            "fields": [{"name": "x", "type": t}],
        }
    schema = json.dumps(
        {"type": "record", "name": "root", "fields": [{"name": "x", "type": t}]}
    ).encode()
    buf = build_avro_container(schema, [zigzag_encode(1)], bytes(16))
    with pytest.raises(ValueError, match="deeper than 16"):
        list(avro_container_records(buf))


def test_synth_replay_closed_form_offline():
    """Hand replay of the fixture tree matches _file_numbers for every
    codec slot (doc 0..7 covers all four codecs and all three V)."""
    for d in range(8):
        meta, files = synth_iceberg_rows(d)
        m = json.loads(meta)
        V = d % 3 + 1
        byname = dict(files)
        (cur,) = [
            s
            for s in m["snapshots"]
            if s["snapshot-id"] == m["current-snapshot-id"]
        ]
        live = {}
        for ri, f, _t, v in avro_container_records(
            byname[cur["manifest-list"]]
        ):
            if f != "manifest_path":
                continue
            ents: dict = {}
            for ri2, f2, _t2, v2 in avro_container_records(byname[v]):
                ents.setdefault(ri2, {})[f2] = v2
            for e in ents.values():
                if e["status"] != "2":
                    live[e["data_file.file_path"]] = (
                        int(e["data_file.record_count"]),
                        int(e["data_file.file_size_in_bytes"]),
                    )
        want = {f"part-{j}-0": _file_numbers(d, j, 0) for j in range(V + 1)}
        want[f"part-{V}-1"] = _file_numbers(d, V, 1)
        assert live == want, d


def test_live_files_reads_current_snapshot_only(spark):
    """Tampering current-snapshot-id to an EARLIER snapshot must change
    the live set (snapshot selection is load-bearing, not decorative)."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame([(2,)], "doc_id long")  # V = 3
    meta_df = synth_iceberg_metadata(docs)
    files_df = synth_iceberg_manifests(docs)
    full = {
        r.file_path
        for r in iceberg_live_files(meta_df, files_df).collect()
    }
    assert full == {"part-0-0", "part-1-0", "part-2-0", "part-3-0",
                    "part-3-1"}
    rolled = meta_df.withColumn(
        "payload",
        F.regexp_replace(
            "payload", '"current-snapshot-id": 203', '"current-snapshot-id": 201'
        ),
    )
    early = {
        r.file_path
        for r in iceberg_live_files(rolled, files_df).collect()
    }
    assert early == {"part-0-0", "part-1-0", "part-1-1"}


def test_corrupt_manifest_quarantines_not_kills(spark):
    """A corrupt manifest file drops to a parse_error row in the keyed
    walker and its entries vanish from the live set — the task
    survives."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame([(1,)], "doc_id long")  # V = 2
    meta_df = synth_iceberg_metadata(docs)
    files_df = synth_iceberg_manifests(docs)
    # smash the carry manifest of the CURRENT snapshot (k=2: holds the
    # EXISTING part-0-0/part-1-0 and the delete of part-1-1)
    broken = files_df.withColumn(
        "payload",
        F.when(
            F.col("file_name") == "m-1-2-carry.avro",
            F.lit(b"Obj\x01 garbage"),
        ).otherwise(F.col("payload")),
    )
    errs = (
        avro_rows_keyed(broken)
        .filter(F.col("parse_error").isNotNull())
        .collect()
    )
    assert {r.file_name for r in errs} == {"m-1-2-carry.avro"}
    live = {
        r.file_path for r in iceberg_live_files(meta_df, broken).collect()
    }
    # the new-manifest files survive; the carry-forward ones are gone
    assert live == {"part-2-0", "part-2-1"}
