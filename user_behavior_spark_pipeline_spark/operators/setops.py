"""Set operations — UNION / INTERSECT / EXCEPT (SURVEY.md §2.5 gap map:
the reference has none).

All three are native Catalyst operators: INTERSECT/EXCEPT plan as
left-semi/left-anti hash joins over distinct inputs, UNION DISTINCT as a
union + hash-distinct — one shuffle each on the full row as the key."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _users_of(events: DataFrame, event_type: str) -> DataFrame:
    return (
        events.filter(F.col("event_type") == event_type)
        .select("user_id")
        .distinct()
    )


def users_intersect(events: DataFrame, type_a: str, type_b: str) -> DataFrame:
    """Users who performed BOTH event types (INTERSECT -> left-semi join)."""
    return _users_of(events, type_a).intersect(_users_of(events, type_b))


def users_except(events: DataFrame, type_a: str, type_b: str) -> DataFrame:
    """Users who performed type_a but never type_b (EXCEPT -> left-anti).

    ``subtract`` (EXCEPT DISTINCT), not ``exceptAll``: the inputs are
    pre-distinct so results agree, but exceptAll PLANS as the multiset
    algorithm (±1 count columns, aggregate, generate) while subtract is
    the left-anti hash join this module documents."""
    return _users_of(events, type_a).subtract(_users_of(events, type_b))


def users_union(events: DataFrame, type_a: str, type_b: str) -> DataFrame:
    """UNION DISTINCT of the two user sets."""
    return _users_of(events, type_a).union(_users_of(events, type_b)).distinct()
