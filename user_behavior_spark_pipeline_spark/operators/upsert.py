"""Keyed-snapshot (SCD-1 / CDC-style) maintenance: batch latest-per-key and
a streaming foreachBatch upsert that keeps a parquet snapshot current as
events arrive — the capability a MERGE-less stack approximates (the
reference stops at append-only sinks; real pipelines need "current state
per key").

At 100 TB: latest-per-key is one hash-agg shuffle carrying a single struct
per key (max_by), not a window sort. The streaming upsert rewrites only the
snapshot (keys-sized, not events-sized) per batch; on a lakehouse table
format (Delta/Iceberg) the same foreachBatch body becomes a MERGE and the
rewrite narrows to matched files — the orchestration shape (stream →
per-batch dedupe → keyed merge) is identical, which is what this module
pins. Tie-breaks are total (ts, then event_id), so the snapshot is
deterministic under any batch slicing — the property the batch-vs-stream
equivalence test relies on.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def latest_snapshot(events: DataFrame) -> DataFrame:
    """Current state per user: the value/type of their latest event
    (ties on ts broken by event_id — a total, deterministic order).

    max_by over an ordering struct = one partial-aggregating shuffle;
    the window/row_number formulation sorts every partition instead."""
    ordering = F.struct(F.col("ts"), F.col("event_id"))
    return events.groupBy("user_id").agg(
        F.max_by("event_type", ordering).alias("last_event_type"),
        F.max_by(F.round(F.col("value") * 100).cast("long"), ordering).alias(
            "last_cents"
        ),
    )


def upsert_stream(
    events_stream: DataFrame,
    snapshot_dir: str,
    checkpoint_dir: str,
):
    """Streaming keyed upsert: each micro-batch folds into a parquet
    snapshot holding exactly one row per user_id (latest wins).

    Batch sizing (e.g. maxFilesPerTrigger) belongs on the SOURCE reader
    that built ``events_stream`` — this function takes the stream as
    given and deliberately exposes no batching knob it could not honor.

    foreachBatch gets the batch as a plain DataFrame: reduce it to one row
    per key, union with the previous snapshot, keep the per-key max by the
    total (ts, event_id) order, swap directories. Exactly-once for the FOLD
    comes from the checkpoint (a replayed batch re-folds to the same
    snapshot — the merge is idempotent because the order is total).

    The two-rename swap is crash-RECOVERABLE, not atomic: a crash between
    the renames leaves current/ missing but swap/ holding the last complete
    snapshot, which the next batch restores before merging (so no batch is
    ever folded against a missing or partial snapshot). ``snapshot_dir``
    must be a local (or POSIX-rename) filesystem — os.rename does not span
    object stores; on S3/HDFS use a table format's MERGE instead (see
    module docstring)."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        import shutil

        spark = batch_df.sparkSession
        current = snapshot_dir + "/current"
        swap = snapshot_dir + "/swap"
        if not os.path.exists(current) and os.path.exists(swap):
            # crashed between the two renames: swap/ IS the last snapshot
            os.rename(swap, current)
        elif os.path.exists(swap):
            # crashed after promoting staging but before cleanup
            shutil.rmtree(swap, ignore_errors=True)
        batch_latest = (
            batch_df.select("user_id", "ts", "event_id", "event_type", "value")
            .groupBy("user_id")
            .agg(
                F.max(F.struct("ts", "event_id", "event_type", "value")).alias("s")
            )
            .select("user_id", "s.ts", "s.event_id", "s.event_type", "s.value")
        )
        if os.path.exists(current):
            # current/ is a REUSED path whose contents change every batch
            # via the rename swap; drop any session-cached file listing for
            # it so the read can't see a retired snapshot's part files
            spark.catalog.refreshByPath(current)
            prev = spark.read.parquet(current)
            merged = (
                prev.unionByName(batch_latest)
                .groupBy("user_id")
                .agg(
                    F.max(F.struct("ts", "event_id", "event_type", "value")).alias(
                        "s"
                    )
                )
                .select("user_id", "s.ts", "s.event_id", "s.event_type", "s.value")
            )
        else:
            merged = batch_latest
        staging = snapshot_dir + f"/staging_{batch_id}"
        merged.write.mode("overwrite").parquet(staging)
        if os.path.exists(current):
            os.rename(current, swap)
        os.rename(staging, current)
        shutil.rmtree(swap, ignore_errors=True)

    writer = events_stream.writeStream.foreachBatch(_merge).option(
        "checkpointLocation", checkpoint_dir
    )
    return writer.trigger(availableNow=True).start()


def read_snapshot(spark: SparkSession, snapshot_dir: str) -> DataFrame:
    return spark.read.parquet(snapshot_dir + "/current")
