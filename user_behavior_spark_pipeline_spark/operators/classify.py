"""3-way event classification (OP-CLASSIFY-UDF-INT, rpg_spark_stream.py:31-40).

The reference tags each raw JSON payload 1/2/3 with an integer Python UDF and
then filters each branch separately — running the classifier (and the JSON
parse inside it) once per branch. Native redesign: one ``when/otherwise``
chain over the already-parsed event_type column; the three branches become
plain filters on the classifier column (or better, one partitioned write —
see streaming.jobs).
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

SWORD = 1
GUILD = 2
OTHER = 3


def classify_event_type_col(event_type: Column | str = "event_type") -> Column:
    """Native classifier: sword-ish -> 1, guild-ish -> 2, else 3.

    Accepts both vocabularies (old purchase_sword/join_guild and new
    sword_event/guild_event — SURVEY.md §0.3)."""
    c = F.col(event_type) if isinstance(event_type, str) else event_type
    return (
        F.when(c.isin("purchase_sword", "sword_event"), F.lit(SWORD))
        .when(c.isin("join_guild", "guild_event"), F.lit(GUILD))
        .otherwise(F.lit(OTHER))
    )


def _classify_event_type(event_as_json):
    """Parity with rpg_spark_stream.py:31-40 (event_type UDF), extended to
    both vocabularies and hardened against malformed JSON."""
    try:
        event = json.loads(event_as_json)
    except (TypeError, ValueError):
        return OTHER
    et = event.get("event_type")
    if et in ("purchase_sword", "sword_event"):
        return SWORD
    if et in ("join_guild", "guild_event"):
        return GUILD
    return OTHER


classify_event_type_udf = F.udf(_classify_event_type, IntegerType())


def split_by_class(parsed: DataFrame, event_type_col: str = "event_type"):
    """The reference's 3-branch fan-out (rpg_spark_stream.py:61,111) as three
    filters over ONE classifier column — Catalyst computes the when-chain once
    per row per branch but each branch is a pushable native predicate."""
    cls = classify_event_type_col(event_type_col)
    tagged = parsed.withColumn("_event_class", cls)
    return (
        tagged.filter(F.col("_event_class") == SWORD).drop("_event_class"),
        tagged.filter(F.col("_event_class") == GUILD).drop("_event_class"),
        tagged.filter(F.col("_event_class") == OTHER).drop("_event_class"),
    )
