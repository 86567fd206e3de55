"""Event schemas.

The reference declares hand-written all-string StructTypes
(rpg_spark_stream.py:10-28, filter_swords_stream.py:19-26,
write_swords_stream.py:19-24) and relies on ``from_json`` nulling out missing
keys — the unified schema carries BOTH event shapes' fields
(rpg_spark_stream.py:26-27), so a guild event yields null ``sword_type`` etc.

Two JSON shapes coexist (SURVEY.md §0.3 / FIXTURES.md §2):

- old  (game_api.py:14-34):   event_type ∈ {default, purchase_sword, join_guild}
                              + sword_type / guild_name
- new  (README.md:252-293):   event_type ∈ {default, sword_event, guild_event}
                              + direction ∈ {increase, reduce} + event_detail

``EVENT_SCHEMA`` is the superset of both, all fields nullable StringType —
exactly the reference's declared-schema contract. ``KAFKA_RECORD_SCHEMA`` is
the fixed schema of Spark's Kafka source (FIXTURES.md §1); the test double
only needs (value, timestamp) but we carry the full shape.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- HTTP headers folded into every event (game_api.py:10-12) ---
HEADER_FIELDS = ["Accept", "Host", "User-Agent"]

# New (canonical) event fields — README.md:252-293, Hive DDL README.md:394-411
NEW_EVENT_FIELDS = ["event_type", "direction", "event_detail"]
# Old event fields — game_api.py:16-33, rpg_spark_stream.py:26-27
OLD_EVENT_FIELDS = ["event_type", "sword_type", "guild_name"]

# Unified superset schema: both shapes parse; absent keys -> null columns.
EVENT_SCHEMA = StructType(
    [
        StructField("Accept", StringType(), True),
        StructField("Host", StringType(), True),
        StructField("User-Agent", StringType(), True),
        StructField("event_type", StringType(), True),
        StructField("direction", StringType(), True),
        StructField("event_detail", StringType(), True),
        StructField("sword_type", StringType(), True),
        StructField("guild_name", StringType(), True),
    ]
)

# Exactly the new shape (README version of rpg_spark_stream.py, README.md:338-346)
NEW_EVENT_SCHEMA = StructType(
    [
        StructField("Accept", StringType(), True),
        StructField("Host", StringType(), True),
        StructField("User-Agent", StringType(), True),
        StructField("event_type", StringType(), True),
        StructField("direction", StringType(), True),
        StructField("event_detail", StringType(), True),
    ]
)

# Spark Kafka source fixed schema (FIXTURES.md §1)
KAFKA_RECORD_SCHEMA = StructType(
    [
        StructField("key", BinaryType(), True),
        StructField("value", BinaryType(), True),
        StructField("topic", StringType(), True),
        StructField("partition", IntegerType(), True),
        StructField("offset", LongType(), True),
        StructField("timestamp", TimestampType(), True),
        StructField("timestampType", IntegerType(), True),
    ]
)

# Test-double: what the harness materializes instead of a Kafka broker.
# The reference only ever touches value + timestamp (filter_swords_batch.py:57-59).
KAFKA_DOUBLE_SCHEMA = StructType(
    [
        StructField("value", StringType(), True),
        StructField("timestamp", TimestampType(), True),
        StructField("offset", LongType(), True),
    ]
)

# Event-type vocabularies (SURVEY.md §1)
NEW_EVENT_TYPES = ("sword_event", "guild_event", "default")
OLD_EVENT_TYPES = ("purchase_sword", "join_guild", "default")
VALID_EVENT_TYPES = ("sword_event", "guild_event")  # is_valid_event, README.md:349-357
DIRECTIONS = ("increase", "reduce")

# Flattened analytics table (`valid_events`) column order — README.md:394-411
VALID_EVENTS_COLUMNS = [
    "raw_event",
    "timestamp",
    "Accept",
    "Host",
    "User-Agent",
    "event_type",
    "direction",
    "event_detail",
]
