"""As-of and range join semantics — constructed-row cases that pin the
boundary rules the oracle parity test can't distinguish (ties, empty
history, interval endpoints, overlaps)."""

from __future__ import annotations

import datetime

import pytest

from user_behavior_spark_pipeline_spark.operators.temporal import (
    asof_join,
    range_join_banded,
)


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def asof_result(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01T10:00:00")),  # before any right row
            (2, 100, _ts("2024-01-01T12:00:00")),  # equal-ts tie with right
            (3, 100, _ts("2024-01-01T13:00:00")),  # after two right rows
            (4, 200, _ts("2024-01-01T12:00:00")),  # key with no right rows
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, _ts("2024-01-01T11:00:00"), 10),
            (100, _ts("2024-01-01T12:00:00"), 20),
        ],
        "user_id long, ts timestamp, v int",
    )
    rows = asof_join(
        left, right, key="user_id", left_ts="ts", right_ts="ts", payload="v"
    ).collect()
    return {r["event_id"]: r["asof_v"] for r in rows}


def test_asof_no_prior_row_is_null(asof_result):
    assert asof_result[1] is None
    assert asof_result[4] is None


def test_asof_equal_ts_counts_as_at_or_before(asof_result):
    assert asof_result[2] == 20


def test_asof_takes_latest_not_first(asof_result):
    assert asof_result[3] == 20


@pytest.fixture(scope="module")
def tiers(spark):
    return spark.createDataFrame(
        [("low", 0.0, 10.0), ("high", 10.0, 30.0), ("wide", 5.0, 25.0)],
        "tier string, lo double, hi double",
    )


def test_range_join_endpoints(spark, tiers):
    facts = spark.createDataFrame(
        [(1, 0.0), (2, 9.99), (3, 10.0), (4, 29.99), (5, 30.0)],
        "id long, v double",
    )
    got = {
        (r["id"], r["tier"])
        for r in range_join_banded(facts, tiers, "v", "lo", "hi", 10.0).collect()
    }
    assert (1, "low") in got and (2, "low") in got
    assert (3, "low") not in got and (3, "high") in got  # lo inclusive
    assert (4, "high") in got
    assert all(id_ != 5 for id_, _ in got)  # hi exclusive, even on boundary


def test_range_join_tolerates_inverted_and_empty_intervals(spark):
    """A dirty interval row with swapped bounds must match nothing and —
    critically — must NOT reach F.sequence with hi_band < lo_band, where
    Spark builds a DESCENDING band array (a 1e9-wide inverted interval
    would materialize a 1e9-element array per row before any filter)."""
    dirty = spark.createDataFrame(
        [
            ("ok", 0.0, 10.0),
            ("inverted", 1e9, 0.0),  # would be a ~1e8-element sequence
            ("empty", 5.0, 5.0),
            ("empty_on_boundary", 10.0, 10.0),
        ],
        "tier string, lo double, hi double",
    )
    facts = spark.createDataFrame(
        [(1, 5.0), (2, 10.0)], "id long, v double"
    )
    got = {
        (r["id"], r["tier"])
        for r in range_join_banded(facts, dirty, "v", "lo", "hi", 10.0).collect()
    }
    assert got == {(1, "ok")}


def test_range_join_overlapping_intervals_multi_match(spark, tiers):
    facts = spark.createDataFrame([(1, 7.0)], "id long, v double")
    got = {
        r["tier"]
        for r in range_join_banded(facts, tiers, "v", "lo", "hi", 10.0).collect()
    }
    assert got == {"low", "wide"}


def test_range_join_matches_theta_join_on_fixture(spark, sf_dir, tiers):
    from user_behavior_spark_pipeline_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    tiers3 = spark.createDataFrame(
        [("bronze", 0.0, 50000.0), ("silver", 50000.0, 150000.0), ("gold", 150000.0, 600000.0)],
        "tier string, lo double, hi double",
    )
    banded = range_join_banded(
        orders, tiers3, "o_totalprice", "lo", "hi", 50000.0
    ).select("o_orderkey", "tier")
    theta = orders.join(
        tiers3,
        (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
    ).select("o_orderkey", "tier")
    assert banded.exceptAll(theta).count() == 0
    assert theta.exceptAll(banded).count() == 0


def test_asof_matches_theta_formulation_on_fixture(spark, sf_dir):
    """The union+window as-of must equal the naive (unscalable) theta-join
    + per-click max on the whole events fixture."""
    import pyspark.sql.functions as F

    from user_behavior_spark_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    )
    got = asof_join(
        clicks, purchases, "user_id", "ts", "ts", "cents"
    ).select("event_id", F.col("asof_cents").alias("cents"))
    p = purchases.select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"), "cents"
    )
    expected = (
        clicks.join(
            p,
            (F.col("user_id") == F.col("p_user")) & (F.col("p_ts") <= F.col("ts")),
            "left",
        )
        .groupBy("event_id")
        .agg(F.max(F.struct("p_ts", "cents")).alias("s"))
        .select("event_id", F.col("s.cents").alias("cents"))
    )
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_asof_forward_direction(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01T10:00:00")),  # next is 11:00
            (2, 100, _ts("2024-01-01T12:00:00")),  # equal-ts tie
            (3, 100, _ts("2024-01-01T13:00:00")),  # nothing after
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, _ts("2024-01-01T11:00:00"), 10),
            (100, _ts("2024-01-01T12:00:00"), 20),
        ],
        "user_id long, ts timestamp, v int",
    )
    rows = asof_join(
        left, right, "user_id", "ts", "ts", "v", direction="forward"
    ).collect()
    got = {r["event_id"]: r["asof_v"] for r in rows}
    assert got == {1: 10, 2: 20, 3: None}


# ---------------------------------------------------------------------------
# Property-based: asof_join must equal a naive per-row reference
# implementation for ANY (key, ts) configuration — random keys, duplicate
# left timestamps, keys with no right rows, both directions.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_small_ts = st.integers(min_value=0, max_value=20)
_small_key = st.integers(min_value=0, max_value=3)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left_rows=st.lists(
        st.tuples(_small_key, _small_ts), min_size=1, max_size=12
    ),
    right_rows=st.lists(
        st.tuples(_small_key, _small_ts), min_size=0, max_size=12, unique=True
    ),
    direction=st.sampled_from(["backward", "forward"]),
)
def test_asof_matches_naive_reference_property(
    spark, left_rows, right_rows, direction
):
    base = datetime.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [
            (i, k, base + datetime.timedelta(hours=t))
            for i, (k, t) in enumerate(left_rows)
        ],
        "event_id long, k long, ts timestamp",
    )
    # payload = t*10 + k keeps (key, right_ts) unique -> which-row-wins
    # is well-defined, per the documented uniqueness precondition
    right = spark.createDataFrame(
        [
            (k, base + datetime.timedelta(hours=t), t * 10 + k)
            for (k, t) in right_rows
        ],
        "k long, rts timestamp, v long",
    )
    got = {
        r["event_id"]: r["asof_v"]
        for r in asof_join(
            left, right, "k", "ts", "rts", "v", direction=direction
        ).collect()
    }

    def naive(k, t):
        cands = [
            (rt, rt * 10 + rk)
            for (rk, rt) in right_rows
            if rk == k and (rt <= t if direction == "backward" else rt >= t)
        ]
        if not cands:
            return None
        pick = max(cands) if direction == "backward" else min(cands)
        return pick[1]

    want = {i: naive(k, t) for i, (k, t) in enumerate(left_rows)}
    assert got == want, (direction, left_rows, right_rows)


def test_resample_dense_zero_fills_gaps(spark):
    """Every (key, bucket) on the global grid appears exactly once; empty
    buckets carry 0; totals are conserved."""
    import datetime

    from user_behavior_spark_pipeline_spark.operators.temporal import (
        resample_dense,
    )

    base = datetime.datetime(2024, 1, 1)

    def _ts(h):
        return base + datetime.timedelta(hours=h)

    rows = [
        (1, _ts(0), 7, "click", 0.0),
        (2, _ts(0), 8, "click", 0.0),
        (3, _ts(5), 9, "click", 0.0),   # 4-hour gap for click
        (4, _ts(2), 7, "view", 0.0),    # view exists only at hour 2
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"
    )
    got = {
        (r["key"], r["bucket_s"]): r["n_events"]
        for r in resample_dense(df).collect()
    }
    lo = int(base.replace(tzinfo=datetime.timezone.utc).timestamp())
    # grid: 2 keys x 6 hourly buckets (hours 0..5)
    assert len(got) == 12
    assert got[("click", lo)] == 2
    assert got[("click", lo + 5 * 3600)] == 1
    assert all(got[("click", lo + h * 3600)] == 0 for h in (1, 2, 3, 4))
    assert got[("view", lo + 2 * 3600)] == 1
    assert sum(got.values()) == 4


def test_resample_dense_clamps_corrupt_timestamp_grid(spark):
    """One corrupt far-future event must NOT inflate the grid (the
    dirty-metadata blowup); its real count still appears (full-outer),
    only the fabricated zero-fill is bounded."""
    import datetime

    from user_behavior_spark_pipeline_spark.operators.temporal import (
        resample_dense,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base, 7, "click", 0.0),
        (2, base + datetime.timedelta(hours=3), 7, "click", 0.0),
        (3, datetime.datetime(2100, 1, 1), 7, "click", 0.0),  # corrupt
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"
    )
    out = resample_dense(df, max_buckets=10).collect()
    assert len(out) == 12  # 11 clamped grid buckets + the far-future row
    by_bucket = {r["bucket_s"]: r["n_events"] for r in out}
    far = int(
        datetime.datetime(2100, 1, 1, tzinfo=datetime.timezone.utc).timestamp()
    )
    assert by_bucket[far] == 1  # real data survives the clamp
    assert sum(by_bucket.values()) == 3
