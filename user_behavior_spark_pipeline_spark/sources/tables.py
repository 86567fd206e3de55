"""Parquet table loaders for the driver test data (TESTDATA.md).

Columnar parquet scan is the engine's batch source (the reference's Presto
side reads the same way — SURVEY.md OP-SRC-PARQUET). Filters/projections
applied on top of these loaders reach the scan via Catalyst pushdown; tests
assert PushedFilters in plans/ helpers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # events.ts is parquet TIMESTAMP(NANOS); with
        # spark.sql.legacy.parquet.nanosAsLong it arrives as ns-since-epoch.
        # Truncate to microseconds — identical to DuckDB's ns->us cast — so
        # every derived value (date_trunc, windows) agrees across engines.
        # integer division — doubles lose precision at ns-since-epoch scale
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works on them
    (the in-process analogue of the reference's Hive catalog —
    SURVEY.md OP-DDL-HIVE / §3.3)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
