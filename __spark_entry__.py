"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``user_behavior_spark_pipeline_spark.registry`` — the query
catalog lives there; tests/test_oracle_parity.py replicates the driver's
DuckDB compare locally at sf0.001.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from user_behavior_spark_pipeline_spark.registry import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's canonical pipeline condensed — raw JSON event
    records → validate (native single-parse) → flatten → per-(type, direction)
    counts (the README.md:657-668 group-by, SURVEY.md §2.4)."""
    from pyspark.sql import functions as F

    from user_behavior_spark_pipeline_spark.operators.ingest import validate_events
    from user_behavior_spark_pipeline_spark.sources.generator import load_kafka_records

    raw = load_kafka_records(spark, "/root/testdata/sf0.001")
    valid = validate_events(raw)
    return (
        valid.groupBy("event_type", "direction")
        .agg(F.count(F.lit(1)).alias("num_events"))
        .orderBy("event_type", "direction")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
