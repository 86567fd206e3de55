"""Pipeline observability: df.observe() metrics ride the existing action
(no extra scan) — the hook a production pipeline uses to validate row
counts/sums inline instead of re-running audit queries."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from user_behavior_spark_pipeline_spark.operators.ingest import validate_events
from user_behavior_spark_pipeline_spark.sources.generator import load_kafka_records


def test_observe_metrics_match_result_without_extra_scan(spark, sf_dir):
    raw = load_kafka_records(spark, sf_dir)
    obs = Observation("ingest_audit")
    valid = validate_events(raw).observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.count(F.col("direction")).alias("with_direction"),
    )
    n = valid.count()  # ONE action drives both the result and the metrics
    assert obs.get["rows"] == n
    assert 0 < obs.get["with_direction"] <= n
