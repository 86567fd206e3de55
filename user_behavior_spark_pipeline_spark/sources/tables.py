"""Parquet table loaders for the driver test data (TESTDATA.md).

Columnar parquet scan is the engine's batch source (the reference's Presto
side reads the same way — SURVEY.md OP-SRC-PARQUET). Filters/projections
applied on top of these loaders reach the scan via Catalyst pushdown; tests
assert PushedFilters in plans/ helpers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampType

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
    if name == "events":
        # Older testdata stored ts as INT64 TIMESTAMP(NANOS), which Spark
        # rejects by default (PARQUET_TYPE_ILLEGAL). The conf is a runtime-
        # settable session conf, so set it here defensively instead of only in
        # session.get_spark — callers (e.g. an externally built SparkSession)
        # must be able to read events without our builder.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # Canonical ts type is TIMESTAMP_NTZ — the exact type DuckDB (and
        # any naive-timestamp engine) sees for parquet
        # TIMESTAMP(isAdjustedToUTC=false), so derived values compare
        # bit-for-bit with the oracle and no session-timezone conversion can
        # leak in. Normalize the two legacy physical encodings to it:
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # TIMESTAMP(NANOS) + nanosAsLong: ns-since-epoch. Truncate to µs
            # with integer division (doubles lose precision at ns scale) and
            # rebase onto an NTZ epoch — wall-clock, tz-independent.
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        elif isinstance(ts_type, TimestampType):
            # isAdjustedToUTC=true data: session tz is pinned to UTC by
            # get_spark; under any other tz this cast is wall-clock in that
            # tz, which is what a naive engine reading the same file sees.
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return df


def register_all(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works on them
    (the in-process analogue of the reference's Hive catalog —
    SURVEY.md OP-DDL-HIVE / §3.3)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
