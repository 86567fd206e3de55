"""Exact-integer statistical aggregates: overflow headroom beyond the
oracle compare (the driver fixture is too small to stress the sums)."""

from __future__ import annotations

from pyspark.sql import functions as F

from user_behavior_spark_pipeline_spark.operators.stats import (
    corr_quantity_price,
)


def test_corr_moment_sums_survive_int64_overflow_scale(spark):
    """price² per row is ~1.1e14, so an int64 sum overflows around 1e5
    rows per group — TPC-H SF1 territory, nowhere near 100 TB. The
    decimal(38,0) moment sums must return a finite, correct correlation
    where a long sum would throw (ANSI) or silently wrap (non-ANSI)."""
    n = 120_000  # sum(price²) ≈ 1.3e19 > int64 max (9.2e18)
    rows = spark.range(n).select(
        F.lit("N").alias("l_returnflag"),
        # qty alternates 10/20, price alternates 104k/106k in step -> a
        # known positive correlation (perfectly linear: corr = 1)
        (F.when(F.col("id") % 2 == 0, 10.0).otherwise(20.0)).alias(
            "l_quantity"
        ),
        (
            F.when(F.col("id") % 2 == 0, 104_000.0).otherwise(106_000.0)
        ).alias("l_extendedprice"),
    )
    out = corr_quantity_price(rows).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == n
    # perfectly linear relationship -> corr_x1e6 == 1_000_000 exactly
    assert r["corr_x1e6"] == 1_000_000, r


def test_hll_gate_holds_at_realistic_cardinality(spark):
    """The sketch_ok gate must use the 5% tolerance, not the sketch's own
    rsd: gating an HLL at its own 1 sd flips false ~32% of the time per
    group (reproduced at 40k distinct users/group), and the driver oracle
    hardcodes TRUE. Five 40k-cardinality groups must all pass."""
    from pyspark.sql import functions as F

    from user_behavior_spark_pipeline_spark.operators.approx import (
        distinct_users_with_sketch,
    )

    events = spark.range(200_000).select(
        F.concat(F.lit("t"), (F.col("id") % 5).cast("string")).alias(
            "event_type"
        ),
        F.col("id").alias("user_id"),
    )
    rows = distinct_users_with_sketch(events).collect()
    assert len(rows) == 5
    assert all(r["sketch_ok"] for r in rows), rows
