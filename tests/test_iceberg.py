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


# ---------------------------------------------------------------------------
# v2 merge-on-read (row-level deletes)
# ---------------------------------------------------------------------------


def _v2_expected(doc_id: int) -> set:
    from user_behavior_spark_pipeline_spark.operators.iceberg import (
        _v2_row_value,
    )

    n = doc_id % 3 + 4
    out = set()
    for i in range(n):
        if i % 3 != 0:
            rid, v = _v2_row_value(doc_id, 0, i)
            out.add((doc_id, f"d-{doc_id}-0", rid, str(v)))
    for i in range(n):
        if i % 4 != 1:
            rid, v = _v2_row_value(doc_id, 1, i)
            out.add((doc_id, f"d-{doc_id}-1", rid, str(v)))
    # d-{doc}-2 was added in the equality delete's own commit: the
    # strictly-older sequence rule keeps ALL its rows (incl. row 1,
    # which the delete names)
    for i in range(doc_id % 2 + 3):
        rid, v = _v2_row_value(doc_id, 2, i)
        out.add((doc_id, f"d-{doc_id}-2", rid, str(v)))
    return out


def test_live_rows_merge_on_read_closed_form(spark):
    """Both delete kinds apply, the planted overlap is idempotent, and
    all four codec slots decode (docs 0..3)."""
    from user_behavior_spark_pipeline_spark.operators.iceberg import (
        iceberg_live_rows,
        synth_iceberg_v2_manifests,
        synth_iceberg_v2_metadata,
    )

    docs = spark.createDataFrame([(d,) for d in range(4)], "doc_id long")
    got = {
        (r.table_id, r.file_path, r.id, r.v)
        for r in iceberg_live_rows(
            synth_iceberg_v2_metadata(docs), synth_iceberg_v2_manifests(docs)
        ).collect()
    }
    assert got == set().union(*(_v2_expected(d) for d in range(4)))


def test_live_rows_stale_delete_is_load_bearing(spark):
    """Reading snapshot 0 (where the stale position-delete file is
    ADDED) must empty d-{doc}-1 — proving the current path's survival
    of file 1 certifies DELETED-status delete files are ignored."""
    from pyspark.sql import functions as F

    from user_behavior_spark_pipeline_spark.operators.iceberg import (
        iceberg_live_rows,
        synth_iceberg_v2_manifests,
        synth_iceberg_v2_metadata,
    )

    docs = spark.createDataFrame([(2,)], "doc_id long")
    meta_df = synth_iceberg_v2_metadata(docs)
    files_df = synth_iceberg_v2_manifests(docs)
    current = {
        (r.file_path, r.id)
        for r in iceberg_live_rows(meta_df, files_df).collect()
    }
    assert {f for f, _ in current} == {"d-2-0", "d-2-1", "d-2-2"}
    # the same-sequence trap: ed-2 NAMES d-2-2 row 1's id, but the
    # file was added in the delete's own commit (seq 2 vs seq 2) —
    # the strictly-older rule keeps it; >= would kill it here
    from user_behavior_spark_pipeline_spark.operators.iceberg import (
        _v2_row_value,
    )

    assert ("d-2-2", _v2_row_value(2, 2, 1)[0]) in current
    rolled = meta_df.withColumn(
        "payload",
        F.regexp_replace(
            "payload",
            '"current-snapshot-id": 201',
            '"current-snapshot-id": 200',
        ),
    )
    early = {
        (r.file_path, r.id)
        for r in iceberg_live_rows(rolled, files_df).collect()
    }
    # snap0: no pd/ed yet, but the stale delete (ADDED there) names
    # every row of d-2-1 — file 1 vanishes, file 0 is FULL
    assert {f for f, _ in early} == {"d-2-0"}
    assert len(early) == 2 % 3 + 4


def test_live_rows_corrupt_delete_file_quarantines(spark):
    """A corrupt position-delete payload quarantines (parse_error row);
    its deletes stop applying but data rows survive — quarantine, not
    silent wrong answers and not task death."""
    from pyspark.sql import functions as F

    from user_behavior_spark_pipeline_spark.operators.iceberg import (
        avro_rows_keyed,
        iceberg_live_rows,
        synth_iceberg_v2_manifests,
        synth_iceberg_v2_metadata,
    )

    docs = spark.createDataFrame([(1,)], "doc_id long")
    meta_df = synth_iceberg_v2_metadata(docs)
    files_df = synth_iceberg_v2_manifests(docs)
    broken = files_df.withColumn(
        "payload",
        F.when(
            F.col("file_name") == "pd-1", F.lit(b"Obj\x01 garbage")
        ).otherwise(F.col("payload")),
    )
    errs = (
        avro_rows_keyed(broken)
        .filter(F.col("parse_error").isNotNull())
        .collect()
    )
    assert {r.file_name for r in errs} == {"pd-1"}
    got = {
        (r.file_path, r.id)
        for r in iceberg_live_rows(meta_df, broken).collect()
    }
    # equality deletes still apply (i%4==1 of file 1 gone, and the
    # overlap id 1000 — in the eq file too — still falls); position
    # deletes don't (file 0 keeps its other i%3==0 rows)
    n = 1 % 3 + 4
    assert {i for f, i in got if f == "d-1-0"} == {
        1000 + i for i in range(1, n)
    }
    assert {i for f, i in got if f == "d-1-1"} == {
        1100 + i for i in range(n) if i % 4 != 1
    }


def test_sequence_number_inheritance_matches_explicit(spark):
    """Spec §Sequence Number Inheritance (r14 — VERDICT r13 #1): the
    default fixture writes ADDED entries with NULL sequence numbers
    (the real-writer shape) inheriting from the manifest list; the
    explicit_seq twin writes the r13 all-explicit shape. The two must
    resolve to the SAME surviving rows — and the resolver must carry
    the inherited values (2 for the current snapshot's new manifest),
    not the legacy 0 that would un-scope the position deletes."""
    from user_behavior_spark_pipeline_spark.operators.iceberg import (
        _resolve_reachable_entries,
        iceberg_live_rows,
        synth_iceberg_v2_rows,
    )

    def _frames(explicit):
        metas, files = [], []
        for d in (1, 6, 11):  # three codec slots
            meta, fs = synth_iceberg_v2_rows(d, explicit_seq=explicit)
            metas.append((d, meta))
            files.extend((d, nm, payload) for nm, payload in fs)
        return (
            spark.createDataFrame(metas, "table_id long, payload string"),
            spark.createDataFrame(
                files, "table_id long, file_name string, payload binary"
            ),
        )

    m_inh, f_inh = _frames(False)
    m_exp, f_exp = _frames(True)
    rows_inh = {
        tuple(r)
        for r in iceberg_live_rows(m_inh, f_inh).collect()
    }
    rows_exp = {
        tuple(r)
        for r in iceberg_live_rows(m_exp, f_exp).collect()
    }
    assert rows_inh == rows_exp and rows_inh
    # the wiring, not just the outcome: the carry manifest's
    # EXISTING/DELETED entries keep their explicit original seq 1
    # (inheritance must NOT overwrite them with the list's 2), and the
    # new manifest's null-seq ADDs all inherit the list's 2 — never
    # the legacy 0
    _longs, entries = _resolve_reachable_entries(m_inh, f_inh)
    seqs = {
        (r.file_name.rsplit("-", 1)[-1], r.seq)
        for r in entries.collect()
    }
    assert seqs == {("carry", 1), ("new", 2)}
