"""Golden-count parity: the reference's published Presto numbers reproduced
end-to-end (SURVEY.md §5 item 3; README.md:657-816)."""

from __future__ import annotations

import pytest

from user_behavior_spark_pipeline_spark.operators.ingest import validate_events
from user_behavior_spark_pipeline_spark.sources.golden import (
    EXPECTED_DIRECTIONS,
    EXPECTED_DISTINCT_ROWS,
    EXPECTED_HOST_TYPE_COUNTS,
    EXPECTED_TOTAL,
    golden_kafka_records,
)


@pytest.fixture(scope="module")
def golden_valid(spark):
    return validate_events(golden_kafka_records(spark)).cache()


def test_total_count(golden_valid):
    assert golden_valid.count() == EXPECTED_TOTAL


def test_host_type_breakdown(golden_valid):
    got = {
        (r["Host"], r["event_type"]): r["n"]
        for r in golden_valid.groupBy("Host", "event_type").count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert got == EXPECTED_HOST_TYPE_COUNTS


def test_direction_split(golden_valid):
    got = {
        r["direction"]: r["n"]
        for r in golden_valid.groupBy("direction").count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert got == EXPECTED_DIRECTIONS


def test_distinct_inventory(golden_valid):
    assert (
        golden_valid.select("Host", "event_type", "event_detail").distinct().count()
        == EXPECTED_DISTINCT_ROWS
    )
