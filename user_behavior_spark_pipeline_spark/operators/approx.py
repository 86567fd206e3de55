"""Approximate aggregates (OP-X-APPROX, SURVEY.md §2.5).

Sketch-based aggregates are THE 100 TB tool: approx_count_distinct (HLL++)
and percentile_approx (KLL-ish) shuffle constant-size sketches instead of
value sets. Their outputs are engine-specific, so the oracle contract is a
**tolerance flag**: the query emits the exact value (engine-independent)
plus a boolean "the sketch landed within tolerance"; the oracle asserts the
same exact value and a hardcoded TRUE. A sketch regression therefore still
fails the hash compare — via the flag, not the raw estimate."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_users_with_sketch(
    events: DataFrame, rsd: float = 0.01, tolerance: float = 0.05
) -> DataFrame:
    """Per-type exact distinct users + HLL estimate within-``tolerance``.

    The sketch precision (rsd = one relative standard deviation) is set
    5× tighter than the 5% gate: gating a sketch at its own 1 sd fails
    ~32% of the time per group BY DESIGN of HLL, while 5 sd of margin
    makes the flag robust at any scale. The gate therefore uses the
    SEPARATE ``tolerance`` — an earlier version reused ``rsd`` for both,
    which kept the flag at 1 sd and made it flip false nondeterministically
    at realistic cardinalities (the driver oracle hardcodes TRUE). Cost is
    2^16 registers per group — KBs."""
    exact = F.countDistinct("user_id")
    approx = F.approx_count_distinct("user_id", rsd)
    return events.groupBy("event_type").agg(
        exact.alias("exact_users"),
        (F.abs(approx - exact) <= F.ceil(exact * F.lit(tolerance))).alias(
            "sketch_ok"
        ),
    )


def value_percentiles_with_sketch(
    events: DataFrame, tolerance: float = 0.05
) -> DataFrame:
    """Per-type exact continuous median (deterministic: interpolation of two
    sorted doubles) + percentile_approx within-tolerance flag."""
    exact_p50 = F.percentile("value", F.lit(0.5))
    approx_p50 = F.percentile_approx("value", F.lit(0.5), F.lit(10000))
    return events.groupBy("event_type").agg(
        F.round(exact_p50 * 100).cast("long").alias("p50_x100"),
        (F.abs(approx_p50 - exact_p50) <= exact_p50 * F.lit(tolerance)).alias(
            "sketch_ok"
        ),
    )


def distinct_users_mergeable_sketch(events: DataFrame, tolerance: float = 0.05) -> DataFrame:
    """MERGEABLE sketches (Datasketches HLL): per-day sketches built in one
    pass, then hll_union_agg'd into the per-type total — the incremental
    rollup pattern that makes 100 TB distinct-counting cheap (daily jobs
    persist KB-sized sketch blobs; any date range is a union of blobs, no
    re-scan). Same tolerance-flag oracle contract as the other sketches."""
    daily = events.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"), F.col("event_type")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users")
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return exact.join(merged, "event_type").select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.ceil(F.col("exact_users") * F.lit(tolerance))
        ).alias("sketch_ok"),
    )
