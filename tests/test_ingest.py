"""Ingest pipeline semantics: dual-schema parse, null propagation, malformed
input, UDF-vs-native equivalence (FIXTURES.md §2 parse contract)."""

from __future__ import annotations

import datetime

import pytest

from user_behavior_spark_pipeline_spark.operators.classify import (
    GUILD,
    OTHER,
    SWORD,
    classify_event_type_col,
    classify_event_type_udf,
    split_by_class,
)
from user_behavior_spark_pipeline_spark.operators.ingest import (
    infer_parse_events,
    parse_events,
    validate_events,
    validate_events_udf_path,
)

TS = datetime.datetime(2024, 1, 1)

NEW_SWORD = (
    '{"event_type":"sword_event","direction":"increase","event_detail":"wood",'
    '"Accept":"*/*","Host":"Player 1","User-Agent":"curl/7.47.0"}'
)
NEW_GUILD = (
    '{"event_type":"guild_event","direction":"reduce","event_detail":"starter guild",'
    '"Accept":"*/*","Host":"Player 2","User-Agent":"curl/7.47.0"}'
)
OLD_SWORD = '{"event_type":"purchase_sword","sword_type":"iron"}'
OLD_GUILD = '{"event_type":"join_guild","guild_name":"knights"}'
DEFAULT = '{"event_type":"default","Accept":"*/*","Host":"x","User-Agent":"c"}'
MALFORMED = "{not json at all"


@pytest.fixture(scope="module")
def raw(spark):
    rows = [
        (NEW_SWORD, TS, 0),
        (NEW_GUILD, TS, 1),
        (OLD_SWORD, TS, 2),
        (OLD_GUILD, TS, 3),
        (DEFAULT, TS, 4),
        (MALFORMED, TS, 5),
        (None, TS, 6),
    ]
    return spark.createDataFrame(rows, "value string, timestamp timestamp, offset long")


def test_unified_schema_spans_both_shapes(raw):
    """Old-shape payloads parse with new-shape fields null and vice versa
    (rpg_spark_stream.py:26-27 superset schema semantics)."""
    parsed = parse_events(raw)
    by_raw = {r["raw_event"]: r for r in parsed.collect() if r["raw_event"]}
    assert by_raw[NEW_SWORD]["event_detail"] == "wood"
    assert by_raw[NEW_SWORD]["sword_type"] is None
    assert by_raw[OLD_SWORD]["sword_type"] == "iron"
    assert by_raw[OLD_SWORD]["direction"] is None
    assert by_raw[OLD_GUILD]["guild_name"] == "knights"


def test_malformed_json_filtered_not_crashed(raw):
    valid = validate_events(raw)
    raws = [r["raw_event"] for r in valid.collect()]
    assert MALFORMED not in raws
    assert len(raws) == 2  # the two new-shape valid events


def test_udf_path_equals_native_path(raw):
    native = sorted(r["raw_event"] for r in validate_events(raw).collect())
    udf = sorted(r["raw_event"] for r in validate_events_udf_path(raw).collect())
    assert native == udf


def test_infer_schema_discovers_union_of_keys(raw):
    inferred = infer_parse_events(raw)
    cols = set(inferred.columns)
    # keys from BOTH shapes present
    assert {"event_type", "direction", "event_detail", "sword_type", "guild_name"} <= cols


def test_classifier_native_equals_udf(spark, raw):
    from pyspark.sql import functions as F

    parsed = parse_events(raw).filter(F.col("event_type").isNotNull())
    native = parsed.select(
        "raw_event", classify_event_type_col("event_type").alias("c")
    )
    via_udf = parsed.select(
        "raw_event", classify_event_type_udf(F.col("raw_event")).alias("c")
    )
    assert sorted(map(tuple, native.collect())) == sorted(map(tuple, via_udf.collect()))


def test_split_by_class_partitions_rows(raw):
    parsed = parse_events(raw)
    swords, guilds, other = split_by_class(parsed)
    assert swords.count() == 2  # new + old sword
    assert guilds.count() == 2  # new + old guild
    assert classify_event_type_col is not None
    assert (SWORD, GUILD, OTHER) == (1, 2, 3)


def test_quarantine_routes_instead_of_dropping(spark):
    """Malformed, wrong-shape, and null payloads all survive with the right
    parse_status; well-formed payloads parse normally."""
    from user_behavior_spark_pipeline_spark.operators.ingest import (
        parse_with_quarantine,
    )

    rows = [
        ('{"event_type": "sword_event", "direction": "increase"}',),
        ("{truncated-garbage",),
        ("[1, 2, 3]",),  # valid JSON, wrong shape -> corrupt
        ("",),  # empty payload: from_json gives a NULL struct with no
        ("  ",),  # corrupt-record capture — must still route to corrupt,
        (None,),  # not fall through to 'ok' with all-null fields
    ]
    df = spark.createDataFrame(rows, "value string")
    got = parse_with_quarantine(df).collect()
    assert len(got) == len(rows)  # nothing dropped
    by_status = {}
    for r in got:
        by_status.setdefault(r["parse_status"], []).append(r)
    assert len(by_status["ok"]) == 1
    assert by_status["ok"][0]["event_type"] == "sword_event"
    assert len(by_status["corrupt"]) == 4
    assert all(r["event_type"] is None for r in by_status["corrupt"])
    # the quarantined raw payload is preserved verbatim for replay
    assert {r["raw_event"] for r in by_status["corrupt"]} == {
        "{truncated-garbage",
        "[1, 2, 3]",
        "",
        "  ",
    }
    assert len(by_status["null"]) == 1


def test_quarantine_all_null_object_is_ok_not_corrupt(spark):
    """'{}' parses to all-null fields — must be 'ok' (the corrupt column,
    not field nullness, is the discriminator)."""
    from user_behavior_spark_pipeline_spark.operators.ingest import (
        parse_with_quarantine,
    )

    df = spark.createDataFrame([("{}",)], "value string")
    row = parse_with_quarantine(df).collect()[0]
    assert row["parse_status"] == "ok"
    assert row["event_type"] is None
