"""Delta-style transaction-log replay — the lakehouse metadata
operation: a table's state is not a directory listing but the REPLAY of
its JSON commit log (add/remove file actions in version order). This
module reads log files as data (one row per commit file), explodes
their JSONL actions with native from_json (zero Python anywhere), and
reconstructs the LIVE file set with a single max_by aggregation — the
last action per path wins, exactly the Delta protocol's replay rule
(PROTOCOL.md, delta.io — public spec; no Delta library involved).

The 100 TB shape: commit files are tiny (KBs) next to the data they
index; the replay is one groupBy(table, path) with a max_by — partial-
aggregable, no window sort, no skew (paths are unique within a table).
That is what makes lakehouse metadata scale: state reconstruction costs
O(actions), never O(data).

Reference parity note: no lakehouse path in the reference (SURVEY.md
§2.1); training-data extension surface (§2.5).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: action schema for from_json — the fields replay needs; unknown
#: action types (protocol/commitInfo/txn) parse to all-null structs and
#: are ignored, exactly how real readers skip actions they don't know.
ACTION_SCHEMA = (
    "add struct<path: string, size: bigint, dataChange: boolean>, "
    "remove struct<path: string, dataChange: boolean>, "
    "metaData struct<id: string, name: string>"
)


def delta_log_actions(logs: DataFrame) -> DataFrame:
    """(table_id, version, payload) commit files -> one row per ACTION:
    (table_id, version, action_idx, action, path, size_bytes).
    Malformed JSON lines become action='corrupt' rows (payload
    preserved upstream) rather than vanishing — the quarantine posture
    for metadata."""
    lines = logs.select(
        "table_id",
        "version",
        F.posexplode(
            F.filter(
                F.split(F.col("payload"), "\n"),
                lambda l: F.trim(l) != "",
            )
        ).alias("action_idx", "line"),
    )
    parsed = lines.withColumn(
        "j", F.from_json("line", ACTION_SCHEMA)
    )
    return parsed.select(
        "table_id",
        "version",
        "action_idx",
        F.when(F.col("j.add.path").isNotNull(), F.lit("add"))
        .when(F.col("j.remove.path").isNotNull(), F.lit("remove"))
        .when(F.col("j.metaData.id").isNotNull(), F.lit("metaData"))
        .otherwise(F.lit("corrupt"))
        .alias("action"),
        F.coalesce("j.add.path", "j.remove.path").alias("path"),
        F.col("j.add.size").alias("size_bytes"),
    )


def delta_live_files(logs: DataFrame) -> DataFrame:
    """Replay the log: the LIVE file set after the latest version.
    One max_by((action, size), (version, action_idx)) per (table,
    path) — the protocol's last-action-wins rule as a single
    partial-aggregable aggregation."""
    acts = delta_log_actions(logs).filter(
        F.col("action").isin("add", "remove")
    )
    last = acts.groupBy("table_id", "path").agg(
        F.max_by(
            F.struct("action", "size_bytes"),
            F.struct("version", "action_idx"),
        ).alias("last")
    )
    return last.filter(F.col("last.action") == "add").select(
        "table_id",
        "path",
        F.col("last.size_bytes").alias("size_bytes"),
    )


def synth_delta_log_rows(doc_id: int) -> list[tuple[int, int, str]]:
    """Deterministic commit history for table ``doc_id``: version 0
    writes metaData + parts 0-0/0-1/0-2 (sizes 100-102); each version
    k in 1..doc_id%3+1 adds part-k-0 (size 100+k) and removes
    part-(k-1)-0. Live set closed form: part-0-1 (101), part-0-2
    (102), part-V-0 (100+V) with V = doc_id%3+1."""
    out = []
    v0 = [
        json.dumps(
            {"metaData": {"id": f"tbl-{doc_id}", "name": f"t{doc_id}"}}
        )
    ]
    for i in range(3):
        v0.append(
            json.dumps(
                {
                    "add": {
                        "path": f"part-0-{i}",
                        "size": 100 + i,
                        "dataChange": True,
                    }
                }
            )
        )
    out.append((doc_id, 0, "\n".join(v0)))
    for k in range(1, doc_id % 3 + 2):
        lines = [
            json.dumps(
                {
                    "add": {
                        "path": f"part-{k}-0",
                        "size": 100 + k,
                        "dataChange": True,
                    }
                }
            ),
            json.dumps(
                {
                    "remove": {
                        "path": f"part-{k - 1}-0",
                        "dataChange": True,
                    }
                }
            ),
        ]
        out.append((doc_id, k, "\n".join(lines)))
    return out


def synth_delta_logs(documents: DataFrame) -> DataFrame:
    """(table_id, version, payload) commit files for every document's
    synthetic table, built executor-side."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    elem = StructType(
        [
            StructField("version", IntegerType()),
            StructField("payload", StringType()),
        ]
    )

    def _build_fn(doc_id):
        import pandas as pd

        return pd.Series(
            [
                [(v, p) for _t, v, p in synth_delta_log_rows(int(d))]
                for d in doc_id
            ]
        )

    _build = pandas_udf(_build_fn, ArrayType(elem), PandasUDFType.SCALAR)
    return (
        documents.select(
            F.col("doc_id").alias("table_id"),
            F.explode(_build("doc_id")).alias("c"),
        )
        .select("table_id", F.col("c.version").alias("version"),
                F.col("c.payload").alias("payload"))
    )
