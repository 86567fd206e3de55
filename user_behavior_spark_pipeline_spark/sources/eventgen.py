"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
partitioned event generator — the engine's source-connector extension point
demonstrated end-to-end (the reference's only custom source is its Flask
producer, game_api.py:7-34; this is the Spark-native equivalent seat).

Rows are a pure function of event_id, so any slice of the source is
reproducible on any executor — the property that makes a generator usable
as a test oracle AND as a 100 TB load source (partitions stream
independently, no coordination, no driver data)."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

EVENT_TYPES = ("click", "view", "signup", "purchase", "error")
DEFAULT_ROWS = 10_000
DEFAULT_PARTITIONS = 8


def gen_row(event_id: int) -> tuple[int, int, str, int]:
    """The generation formula — shared with tests/oracles (keep in sync
    with the SQL form in registry.py::_EVENTGEN_ORACLE)."""
    return (
        event_id,
        event_id % 50,
        EVENT_TYPES[event_id % 5],
        (event_id * 37) % 10_000,
    )


class EventGenReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", DEFAULT_ROWS))
        self.num_partitions = int(options.get("partitions", DEFAULT_PARTITIONS))

    def partitions(self):
        return [InputPartition(i) for i in range(self.num_partitions)]

    def read(self, partition):
        per = -(-self.rows // self.num_partitions)  # ceil
        lo = partition.value * per
        hi = min(lo + per, self.rows)
        for event_id in range(lo, hi):
            yield gen_row(event_id)


class EventGenStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin: offsets are plain row counts; each micro-batch
    advances by ``rows_per_batch`` until ``rows`` is exhausted. Offsets are
    values, rows are a pure function of the offset range — replaying any
    (start, end) slice after a checkpoint restart regenerates identical
    rows, which is exactly the contract exactly-once needs from a source."""

    def __init__(self, options):
        self.rows = int(options.get("rows", DEFAULT_ROWS))
        # 0 = drain everything remaining in one read() — availableNow
        # triggers take exactly one read() from a simple reader, so a
        # smaller fixed batch would stop the drain early
        self.rows_per_batch = int(options.get("rowsPerBatch", 0))

    # NB: no latestOffset — SimpleDataSourceStreamReader's contract is
    # initialOffset/read/readBetweenOffsets; progress comes from read()'s
    # returned end offset (latestOffset belongs to the full
    # DataSourceStreamReader API and would never be invoked here)
    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        lo = start["pos"]
        step = self.rows_per_batch or self.rows
        hi = min(lo + step, self.rows)
        return iter([gen_row(i) for i in range(lo, hi)]), {"pos": hi}

    def readBetweenOffsets(self, start, end):
        return iter([gen_row(i) for i in range(start["pos"], end["pos"])])


class EventGenDataSource(DataSource):
    """spark.read.format("eventgen").option("rows", N).load() — batch —
    and spark.readStream.format("eventgen") — micro-batch stream."""

    @classmethod
    def name(cls) -> str:
        return "eventgen"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, event_type string, cents bigint"

    def reader(self, schema):
        return EventGenReader(self.options)

    def simpleStreamReader(self, schema):
        return EventGenStreamReader(self.options)


@dataclass
class ReceiptMessage(WriterCommitMessage):
    rows: int = 0
    cents: int = 0


class ReceiptWriter(DataSourceWriter):
    """Custom sink seat (DataSourceWriter): per-partition tasks stream rows
    and emit a commit message; the DRIVER's commit() writes one atomic
    receipt only if every task succeeded — the standard two-phase sink
    contract (task output is provisional until the driver commit, exactly
    the ManifestFileCommitProtocol shape the reference's file sink logs,
    README.md:1224-1226)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("receipt writer requires a 'path' option")

    def write(self, iterator):
        rows = 0
        cents = 0
        for row in iterator:
            rows += 1
            cents += row["cents"]
        return ReceiptMessage(rows=rows, cents=cents)

    def commit(self, messages):
        import json
        import os

        receipt = {
            "partitions": len(messages),
            "rows": sum(m.rows for m in messages),
            "cents": sum(m.cents for m in messages),
        }
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, "_receipt.tmp")
        with open(tmp, "w") as f:
            json.dump(receipt, f)
        os.rename(tmp, os.path.join(self.path, "receipt.json"))

    def abort(self, messages):
        pass


class ReceiptSinkDataSource(DataSource):
    """df.write.format("receipt").option("path", dir).save()"""

    @classmethod
    def name(cls) -> str:
        return "receipt"

    def writer(self, schema, overwrite):
        return ReceiptWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(EventGenDataSource)
    spark.dataSource.register(ReceiptSinkDataSource)
