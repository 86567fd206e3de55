"""Golden workload: the reference's exact published event mix, reproduced
deterministically (FIXTURES.md §2d; README.md:527-816).

The reference's de-facto assertions are Presto counts after a known manual +
apache-bench workload (SURVEY.md §5 "golden counts"):

- warmup via curl (Host ``localhost:5000``): 12 sword events over details
  {wood, two-handed, short, long, glass, bronze}, 4 guild events over
  {starter guild, PVP-Friends, Data-Engineers}, including the 3 ``reduce``
  events (README.md:657-663: increase 11724 / reduce 3);
- ab batches: 100 sword ``test_sword_1`` @ Player 1, 200 sword
  ``test_sword_2`` @ Player 2, 100 sword ``test_sword_3`` @ Player 3,
  100 guild ``W205-Test`` @ Player 3, 100 guild ``Office-Hours`` @ Player 2,
  11111 guild ``Ready_to_submit`` @ ``Jordan Meyer``;

giving exactly the host × event_type table at README.md:776-791 and the
15-row (host, type, detail) inventory at README.md:793-816. (The README's
own ``count(*)`` of 11726 disagrees by 1 with its own breakdowns, which sum
to 11727 — we reproduce the detailed tables, the self-consistent ones.)

The expansion is Spark-side (spec rows exploded with ``sequence``), so the
same generator scales to arbitrarily large replays without a driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (n, host, event_type, direction, event_detail)
GOLDEN_SPEC: list[tuple[int, str, str, str, str]] = [
    # --- warmup: curl from the host box (README.md:527-563) ---
    (3, "localhost:5000", "sword_event", "increase", "wood"),
    (2, "localhost:5000", "sword_event", "increase", "two-handed"),
    (1, "localhost:5000", "sword_event", "increase", "short"),
    (1, "localhost:5000", "sword_event", "reduce", "short"),
    (1, "localhost:5000", "sword_event", "increase", "long"),
    (1, "localhost:5000", "sword_event", "reduce", "long"),
    (2, "localhost:5000", "sword_event", "increase", "glass"),
    (1, "localhost:5000", "sword_event", "increase", "bronze"),
    (1, "localhost:5000", "guild_event", "increase", "starter guild"),
    (1, "localhost:5000", "guild_event", "reduce", "starter guild"),
    (1, "localhost:5000", "guild_event", "increase", "PVP-Friends"),
    (1, "localhost:5000", "guild_event", "increase", "Data-Engineers"),
    # --- apache-bench batches (README.md:677-755) ---
    (100, "Player 1", "sword_event", "increase", "test_sword_1"),
    (200, "Player 2", "sword_event", "increase", "test_sword_2"),
    (100, "Player 3", "sword_event", "increase", "test_sword_3"),
    (100, "Player 3", "guild_event", "increase", "W205-Test"),
    (100, "Player 2", "guild_event", "increase", "Office-Hours"),
    (11111, "Jordan Meyer", "guild_event", "increase", "Ready_to_submit"),
]

# The README.md:776-791 table, verbatim (host, event_type, num_events)
EXPECTED_HOST_TYPE_COUNTS = {
    ("localhost:5000", "sword_event"): 12,
    ("Player 1", "sword_event"): 100,
    ("Player 2", "sword_event"): 200,
    ("Player 3", "sword_event"): 100,
    ("localhost:5000", "guild_event"): 4,
    ("Player 2", "guild_event"): 100,
    ("Player 3", "guild_event"): 100,
    ("Jordan Meyer", "guild_event"): 11111,
}
EXPECTED_TOTAL = 11727
EXPECTED_DIRECTIONS = {"increase": 11724, "reduce": 3}
EXPECTED_DISTINCT_ROWS = 15  # README.md:793-816


def golden_kafka_records(spark: SparkSession) -> DataFrame:
    """The golden workload as Kafka-double records (value, timestamp, offset)."""
    spec = spark.createDataFrame(
        [(i, *row) for i, row in enumerate(GOLDEN_SPEC)],
        "spec_id int, n int, Host string, event_type string, "
        "direction string, event_detail string",
    )
    rows = spec.select(
        "spec_id",
        "Host",
        "event_type",
        "direction",
        "event_detail",
        F.explode(F.sequence(F.lit(1), F.col("n"))).alias("i"),
    )
    payload = F.to_json(
        F.struct(
            F.col("event_type"),
            F.col("direction"),
            F.col("event_detail"),
            F.lit("*/*").alias("Accept"),
            F.col("Host"),
            F.lit("ApacheBench/2.3").alias("User-Agent"),
        )
    )
    offset = F.col("spec_id") * 100000 + F.col("i")
    return rows.select(
        payload.alias("value"),
        F.timestamp_seconds(F.lit(1638662400) + offset).alias("timestamp"),
        offset.alias("offset"),
    )
