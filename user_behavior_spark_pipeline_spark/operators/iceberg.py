"""Iceberg-style manifest replay — the OTHER lakehouse metadata
topology (iceberg.apache.org/spec, public): where Delta reconstructs
state by REPLAYING a JSON action log (operators/deltalog.py), Iceberg
snapshots are self-contained — the table metadata JSON names a current
snapshot, the snapshot points at a MANIFEST LIST (an Avro file of
manifest-file entries), each manifest (Avro again) carries data-file
entries with a status (0=EXISTING carried forward, 1=ADDED by this
snapshot, 2=DELETED by it). Live files of a snapshot = every entry in
its reachable manifests with status != DELETED.

Composition, not new machinery: the Avro object-container walker
(operators/avro.py — nested ``data_file`` records flatten to dotted
field names) explodes both metadata levels to the generic long format,
the metadata JSON parses JVM-side with from_json, and the rest is
joins + one pivot aggregation over METADATA-scale rows. The 100 TB
judgment is the same as deltalog.py's: state reconstruction costs
O(manifest entries), never O(data) — manifests are KBs pointing at TBs
— and every join here is metadata-vs-metadata (broadcastable in a real
deployment).

Scope note: fixture manifests carry the spec's load-bearing fields
(status, snapshot_id, data_file{file_path, file_format, record_count,
file_size_in_bytes}); real manifests add field-id-based resolution,
partition structs and column stats — documented seam, the topology and
status semantics are what this operator certifies.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..materialize import materialize
from .avro import avro_container_records, build_avro_container, zigzag_encode

#: table metadata JSON — Iceberg's dashed key names, verbatim.
ICEBERG_META_SCHEMA = StructType(
    [
        StructField("current-snapshot-id", LongType()),
        StructField(
            "snapshots",
            ArrayType(
                StructType(
                    [
                        StructField("snapshot-id", LongType()),
                        StructField("manifest-list", StringType()),
                    ]
                )
            ),
        ),
    ]
)

ICE_LONG_SCHEMA = StructType(
    [
        StructField("table_id", LongType(), False),
        StructField("file_name", StringType(), True),
        StructField("rec_idx", LongType(), True),
        StructField("field", StringType(), True),
        StructField("value", StringType(), True),
        StructField("parse_error", StringType(), True),
    ]
)


def avro_rows_keyed(files: DataFrame) -> DataFrame:
    """(table_id, file_name, payload) Avro files -> the long format
    keyed by (table_id, file_name) — same walker, same quarantine
    contract as avro.avro_records, with the file name carried through
    so manifest-list entries can join to the manifests they name."""

    def _walk(batches):
        import pandas as pd

        for batch in batches:
            rows = []
            for tid, fname, payload in zip(
                batch["table_id"], batch["file_name"], batch["payload"]
            ):
                t = int(tid)
                try:
                    for ri, fld, _typ, v in avro_container_records(
                        bytes(payload)
                    ):
                        rows.append((t, str(fname), ri, fld, v, None))
                except ValueError as e:
                    rows.append((t, str(fname), None, None, None, str(e)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in ICE_LONG_SCHEMA.fields]
            )

    return files.select("table_id", "file_name", "payload").mapInPandas(
        _walk, ICE_LONG_SCHEMA
    )


def iceberg_live_files(
    metadata: DataFrame, files: DataFrame
) -> DataFrame:
    """Resolve each table's CURRENT snapshot through the two Avro
    levels: metadata JSON -> current snapshot's manifest list ->
    manifests -> data-file entries with status != 2 (DELETED). Emits
    (table_id, file_path, record_count, file_size_in_bytes).

    Plan shape: one from_json + explode for snapshot selection, one
    pivot aggregation per manifest entry (groupBy (table, file, rec) —
    partial-aggregable, keys unique by construction), two
    metadata-scale joins. Nothing here ever touches a data file."""
    meta = metadata.select(
        "table_id",
        F.from_json("payload", ICEBERG_META_SCHEMA).alias("j"),
    )
    current = (
        meta.select(
            "table_id",
            F.col("j.`current-snapshot-id`").alias("cur"),
            F.explode("j.snapshots").alias("s"),
        )
        .filter(F.col("s.`snapshot-id`") == F.col("cur"))
        .select(
            "table_id", F.col("s.`manifest-list`").alias("list_name")
        )
    )
    # the long table feeds BOTH the manifest-list join and the entry
    # pivot — without pinning it, the whole Avro walk (and in the
    # certified query, the fixture synthesis above it) runs twice.
    # Metadata-scale rows: the materialization is KBs per table.
    longs = materialize(
        avro_rows_keyed(files).filter(F.col("parse_error").isNull())
    )
    # manifest-list rows: which manifests the current snapshot reaches
    reachable = (
        longs.filter(F.col("field") == "manifest_path")
        .select("table_id", "file_name", F.col("value").alias("manifest"))
        .join(
            # one row per table: always broadcast — the manifest-list
            # long rows never shuffle for this join
            F.broadcast(current),
            (F.col("file_name") == F.col("list_name"))
            & (longs["table_id"] == current["table_id"]),
        )
        .select(longs["table_id"].alias("table_id"), "manifest")
    )
    # manifest entries, pivoted wide from the long format
    ents = (
        longs.filter(F.col("field").isin(
            "status",
            "data_file.file_path",
            "data_file.record_count",
            "data_file.file_size_in_bytes",
        ))
        .groupBy("table_id", "file_name", "rec_idx")
        .agg(
            F.max(F.when(F.col("field") == "status", F.col("value")))
            .alias("status"),
            F.max(
                F.when(
                    F.col("field") == "data_file.file_path", F.col("value")
                )
            ).alias("file_path"),
            F.max(
                F.when(
                    F.col("field") == "data_file.record_count",
                    F.col("value"),
                )
            ).alias("record_count"),
            F.max(
                F.when(
                    F.col("field") == "data_file.file_size_in_bytes",
                    F.col("value"),
                )
            ).alias("file_size"),
        )
    )
    live = ents.join(
        # a few manifests per table: broadcast, so the (bigger) entry
        # table is filtered map-side instead of shuffling twice
        F.broadcast(reachable),
        (ents["file_name"] == reachable["manifest"])
        & (ents["table_id"] == reachable["table_id"]),
    ).filter(F.col("status") != "2")
    return live.select(
        ents["table_id"].alias("table_id"),
        "file_path",
        F.col("record_count").cast("long").alias("record_count"),
        F.col("file_size").cast("long").alias("file_size_in_bytes"),
    )


# ---------------------------------------------------------------------------
# Deterministic fixture: V = doc%3+1 snapshots of adds + rewrites
# ---------------------------------------------------------------------------

_ENTRY_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": "long"},
            {
                "name": "data_file",
                "type": {
                    "type": "record",
                    "name": "data_file",
                    "fields": [
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {"name": "record_count", "type": "long"},
                        {"name": "file_size_in_bytes", "type": "long"},
                    ],
                },
            },
        ],
    }
).encode()

_LIST_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string"},
            {"name": "added_snapshot_id", "type": "long"},
        ],
    }
).encode()


def _enc_str(s: str) -> bytes:
    b = s.encode()
    return zigzag_encode(len(b)) + b


def _entry_body(
    status: int, snap: int, path: str, nrec: int, size: int
) -> bytes:
    # nested records concatenate — no tags in Avro binary
    return (
        zigzag_encode(status)
        + zigzag_encode(snap)
        + _enc_str(path)
        + _enc_str("PARQUET")
        + zigzag_encode(nrec)
        + zigzag_encode(size)
    )


def _file_numbers(doc_id: int, j: int, sub: int) -> tuple[int, int]:
    """Closed-form (record_count, file_size) for data file part-j-sub —
    mirrored verbatim by the oracle SQL."""
    return (
        doc_id + j * 3 + sub + 5,
        (doc_id % 97 + j * 2 + sub) * 16 + 64,
    )


def synth_iceberg_rows(
    doc_id: int, with_files: bool = True
) -> tuple[str, list[tuple[str, bytes]]]:
    """One table's full metadata tree: (metadata_json, [(file_name,
    avro_bytes), ...]). Snapshot k (0..V, V = doc_id%3+1) ADDs
    part-k-0 and part-k-1 and (k>0) DELETEs part-(k-1)-1 — a rewrite —
    while carrying part-j-0 (j<k) forward as EXISTING in a second
    manifest. current-snapshot-id = doc_id*100 + V, so reading any
    other snapshot (or ignoring DELETED status) breaks the hash. Live
    closed form: part-j-0 for j in 0..V plus part-V-1. Manifest codec
    rotates doc_id%4 through null/deflate/zstandard/snappy — the
    Iceberg path re-certifies every container codec.

    ``with_files=False`` skips the Avro byte assembly (the metadata
    JSON needs only names) — the metadata builder would otherwise pay
    the full container-build cost per doc just to discard it."""
    V = doc_id % 3 + 1
    codec = ("null", "deflate", "zstandard", "snappy")[doc_id % 4]
    sync = bytes((doc_id * 11 + k * 17) % 256 for k in range(16))
    files: list[tuple[str, bytes]] = []
    snapshots = []
    for k in range(V + 1):
        snap_id = doc_id * 100 + k
        new_name = f"m-{doc_id}-{k}-new.avro"
        recs = []
        for sub in (0, 1):
            nrec, size = _file_numbers(doc_id, k, sub)
            recs.append(
                _entry_body(1, snap_id, f"part-{k}-{sub}", nrec, size)
            )
        if with_files:
            files.append(
                (
                    new_name,
                    build_avro_container(_ENTRY_SCHEMA, recs, sync, codec),
                )
            )
        names = [new_name]
        if k > 0:
            carry_name = f"m-{doc_id}-{k}-carry.avro"
            recs = []
            for j in range(k):
                nrec, size = _file_numbers(doc_id, j, 0)
                recs.append(
                    _entry_body(0, snap_id, f"part-{j}-0", nrec, size)
                )
            nrec, size = _file_numbers(doc_id, k - 1, 1)
            recs.append(
                _entry_body(2, snap_id, f"part-{k - 1}-1", nrec, size)
            )
            if with_files:
                files.append(
                    (
                        carry_name,
                        build_avro_container(
                            _ENTRY_SCHEMA, recs, sync, codec
                        ),
                    )
                )
            names.append(carry_name)
        list_name = f"ml-{doc_id}-{k}.avro"
        if with_files:
            files.append(
                (
                    list_name,
                    build_avro_container(
                        _LIST_SCHEMA,
                        [
                            _enc_str(nm) + zigzag_encode(snap_id)
                            for nm in names
                        ],
                        sync,
                        codec,
                    ),
                )
            )
        snapshots.append(
            {"snapshot-id": snap_id, "manifest-list": list_name}
        )
    meta = json.dumps(
        {
            "format-version": 2,
            "current-snapshot-id": doc_id * 100 + V,
            "snapshots": snapshots,
        }
    )
    return meta, files


def synth_iceberg_metadata(documents: DataFrame) -> DataFrame:
    """(table_id, payload JSON string) per document-table."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    def _build_fn(doc_id):
        import pandas as pd

        return pd.Series(
            [
                synth_iceberg_rows(int(d), with_files=False)[0]
                for d in doc_id
            ]
        )

    _build = pandas_udf(_build_fn, StringType(), PandasUDFType.SCALAR)
    return documents.select(
        F.col("doc_id").alias("table_id"),
        _build("doc_id").alias("payload"),
    )


def synth_iceberg_manifests(documents: DataFrame) -> DataFrame:
    """(table_id, file_name, payload) — every manifest list and
    manifest of every table, built executor-side."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    elem = StructType(
        [
            StructField("file_name", StringType()),
            StructField("payload", BinaryType()),
        ]
    )

    def _build_fn(doc_id):
        import pandas as pd

        return pd.Series(
            [synth_iceberg_rows(int(d))[1] for d in doc_id]
        )

    _build = pandas_udf(_build_fn, ArrayType(elem), PandasUDFType.SCALAR)
    return documents.select(
        F.col("doc_id").alias("table_id"),
        F.explode(_build("doc_id")).alias("c"),
    ).select(
        "table_id",
        F.col("c.file_name").alias("file_name"),
        F.col("c.payload").alias("payload"),
    )
