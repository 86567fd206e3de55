"""Deterministic reference-shape event generation (OP-SRC-PRODUCER stand-in).

The reference's producer is a Flask app pushing JSON to Kafka
(game_api.py:7-34, README.md:252-293). For a hermetic engine we derive the
same record shapes *deterministically* from the driver's ``events`` parquet
table, so every generated field is a pure column expression — reproducible in
the DuckDB oracle with ordinary SQL (no JSON round-trip needed on the oracle
side).

Mapping (events table -> new-shape event, FIXTURES.md §2a):

- event_type: purchase -> sword_event, signup -> guild_event, else default
- direction:  event_id % 10 < 8 -> increase else reduce
- event_detail: sword -> {wood,iron,steel,gold}[event_id % 4];
                guild -> 'starter guild'/'iron guild'[event_id % 2];
                default -> null
- Host: 'Player ' || (user_id % 10)   (Host doubles as the player id,
                                       README.md:677)
- Accept '*/*', User-Agent 'curl/7.47.0' (header merge, game_api.py:10-12)

The Kafka test-double record is (value JSON string, timestamp, offset)
(FIXTURES.md §1). ``to_json`` of a struct with the fields in a fixed order
gives the value payload.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SWORD_DETAILS = ("wood", "iron", "steel", "gold")
GUILD_DETAILS = ("starter guild", "iron guild")


def _ref_event_type(event_type: Column) -> Column:
    return (
        F.when(event_type == "purchase", F.lit("sword_event"))
        .when(event_type == "signup", F.lit("guild_event"))
        .otherwise(F.lit("default"))
    )


def _direction(event_id: Column) -> Column:
    return F.when(event_id % 10 < 8, F.lit("increase")).otherwise(F.lit("reduce"))


def _event_detail(ref_type: Column, event_id: Column) -> Column:
    sword = (
        F.when(event_id % 4 == 0, SWORD_DETAILS[0])
        .when(event_id % 4 == 1, SWORD_DETAILS[1])
        .when(event_id % 4 == 2, SWORD_DETAILS[2])
        .otherwise(SWORD_DETAILS[3])
    )
    guild = F.when(event_id % 2 == 0, GUILD_DETAILS[0]).otherwise(GUILD_DETAILS[1])
    return (
        F.when(ref_type == "sword_event", sword)
        .when(ref_type == "guild_event", guild)
        .otherwise(F.lit(None).cast("string"))
    )


def ref_event_columns(events: DataFrame) -> DataFrame:
    """events table -> the new-shape event fields as flat columns
    (plus event_id for row identity)."""
    ref_type = _ref_event_type(F.col("event_type"))
    return events.select(
        F.col("event_id"),
        F.col("ts"),
        ref_type.alias("event_type"),
        _direction(F.col("event_id")).alias("direction"),
        _event_detail(ref_type, F.col("event_id")).alias("event_detail"),
        F.lit("*/*").alias("Accept"),
        F.concat(F.lit("Player "), (F.col("user_id") % 10).cast("string")).alias("Host"),
        F.lit("curl/7.47.0").alias("User-Agent"),
    )


def kafka_records(events: DataFrame) -> DataFrame:
    """events table -> Kafka test-double records (value, timestamp, offset).

    value is the JSON payload the reference's producer would have sent
    (game_api.py:12 ``json.dumps(event)``)."""
    cols = ref_event_columns(events)
    payload = F.to_json(
        F.struct(
            F.col("event_type"),
            F.col("direction"),
            F.col("event_detail"),
            F.col("Accept"),
            F.col("Host"),
            F.col("User-Agent"),
        )
    )
    return cols.select(
        payload.alias("value"),
        F.col("ts").alias("timestamp"),
        F.col("event_id").alias("offset"),
    )


def load_kafka_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .tables import load_table

    return kafka_records(load_table(spark, sf_dir, "events"))
