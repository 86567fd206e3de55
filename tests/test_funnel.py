"""Funnel semantics on constructed journeys where the answer is known."""

from __future__ import annotations

import datetime

from user_behavior_spark_pipeline_spark.operators.funnel import (
    funnel_counts,
    funnel_reach,
)

SCHEMA = "user_id long, event_type string, ts timestamp_ntz"


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, _ts(ts)) for u, t, ts in rows], SCHEMA
    )


def test_funnel_order_matters(spark):
    rows = [
        # user 1: full ordered journey
        (1, "view", "2024-01-01T00:00:00"),
        (1, "click", "2024-01-01T01:00:00"),
        (1, "purchase", "2024-01-01T02:00:00"),
        # user 2: purchase BEFORE the view/click — only depth 2
        (2, "purchase", "2024-01-01T00:00:00"),
        (2, "view", "2024-01-01T01:00:00"),
        (2, "click", "2024-01-01T02:00:00"),
        # user 3: view only
        (3, "view", "2024-01-01T00:00:00"),
        # user 4: no view at all — not in the funnel
        (4, "click", "2024-01-01T00:00:00"),
    ]
    got = {
        r["user_id"]: r["steps_reached"]
        for r in funnel_reach(
            _ev(spark, rows), ("view", "click", "purchase")
        ).collect()
    }
    assert got == {1: 3, 2: 2, 3: 1}


def test_funnel_horizon_cuts_late_completions(spark):
    rows = [
        (1, "view", "2024-01-01T00:00:00"),
        (1, "click", "2024-01-01T01:00:00"),
        (1, "purchase", "2024-01-20T00:00:00"),  # 19 days later
    ]
    reach = funnel_reach(
        _ev(spark, rows), ("view", "click", "purchase"), horizon_seconds=7 * 86400
    ).collect()[0]
    assert reach["steps_reached"] == 2


def test_funnel_same_timestamp_is_not_ordered(spark):
    """Strict order: a click at exactly the view's timestamp doesn't count
    (ties are not a progression)."""
    rows = [
        (1, "view", "2024-01-01T00:00:00"),
        (1, "click", "2024-01-01T00:00:00"),
    ]
    reach = funnel_reach(_ev(spark, rows), ("view", "click")).collect()[0]
    assert reach["steps_reached"] == 1


def test_funnel_counts_monotone(spark, sf_dir):
    from user_behavior_spark_pipeline_spark.sources.tables import load_table

    out = {
        r["step_index"]: r["n_users"]
        for r in funnel_counts(
            load_table(spark, sf_dir, "events"),
            ("view", "click", "purchase"),
            horizon_seconds=7 * 86400,
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1] >= out[2] >= out[3] >= 0
    assert out[1] > 0
