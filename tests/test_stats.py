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


def test_misra_gries_recalls_every_true_heavy_hitter_under_pruning(spark):
    """Force real MG pruning (k=20 counters against 2,000 distinct items)
    on a zipf-ish stream and check the theorem end-to-end: every item with
    true count > n/(k+1) is in the candidate set, every estimate is an
    underestimate within n/(k+1), and the certified flag logic would pass.
    Deterministic — holds for ANY partitioning/batch order, so no seeds."""
    from user_behavior_spark_pipeline_spark.operators.approx import (
        heavy_hitter_candidates,
    )

    k = 20
    # 10 hot items with 400 occurrences each + 2000 tail items with 3 each
    # -> n = 10000, n/(k+1) = 476 ... too big; use 40 hot x 400 = 16000 +
    # tail 2000*3 = 6000 -> n = 22000, bound = 1047, hot(400) below bound.
    # Make hot items clear the bound: 10 hot x 3000 = 30000, tail 6000
    # -> n = 36000, bound = 1714 < 3000. Repartition to 8 so per-partition
    # vocab (~2010) far exceeds k and pruning fires in every partition.
    hot = spark.range(30_000).select(
        F.concat(F.lit("hot"), (F.col("id") % 10).cast("string")).alias("t")
    )
    tail = spark.range(6_000).select(
        F.concat(F.lit("tail"), (F.col("id") % 2000).cast("string")).alias(
            "t"
        )
    )
    items = hot.union(tail).repartition(8)
    n = 36_000
    bound = n // (k + 1)
    est = {
        r["t"]: r["est_count"]
        for r in heavy_hitter_candidates(items, "t", k).collect()
    }
    true = {f"hot{i}": 3000 for i in range(10)}
    for t, c in true.items():
        assert t in est, f"heavy hitter {t} (count {c} > {bound}) missed"
        assert 0 < est[t] <= c, (t, est[t], c)
        assert c - est[t] <= bound, (t, est[t], c, bound)
    # every reported estimate underestimates its true count (tail = 3)
    for t, e in est.items():
        assert e <= true.get(t, 3), (t, e)


def test_distribution_drift_hand_computed(spark):
    """4 events, two types, split at the midpoint: type a is 2/2 in half A
    vs 0/2 in half B -> |1 - 0| = 1e9; type b symmetric."""
    from pyspark.sql import functions as F

    from user_behavior_spark_pipeline_spark.operators.stats import (
        distribution_drift,
    )

    rows = [
        ("a", "2024-01-01 00:00:00"),
        ("a", "2024-01-01 01:00:00"),
        ("b", "2024-01-02 00:00:00"),
        ("b", "2024-01-02 01:00:00"),
    ]
    events = spark.createDataFrame(rows, "event_type string, ts string").select(
        "event_type", F.col("ts").cast("timestamp_ntz").alias("ts")
    )
    out = {r["event_type"]: r for r in distribution_drift(events).collect()}
    assert out["a"]["ca"] == 2 and out["a"]["cb"] == 0
    assert out["b"]["ca"] == 0 and out["b"]["cb"] == 2
    assert out["a"]["tvd_x1e9"] == 1_000_000_000
    assert out["b"]["tvd_x1e9"] == 1_000_000_000


def test_distribution_drift_degenerate_single_instant(spark):
    """All rows at one timestamp: half A is empty (micros < mid is false
    when mid == mn) -> tvd is NULL, not a division error."""
    from pyspark.sql import functions as F

    from user_behavior_spark_pipeline_spark.operators.stats import (
        distribution_drift,
    )

    events = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00")] * 3, "event_type string, ts string"
    ).select("event_type", F.col("ts").cast("timestamp_ntz").alias("ts"))
    row = distribution_drift(events).collect()[0]
    assert row["ca"] == 0 and row["cb"] == 3
    assert row["tvd_x1e9"] is None


def test_robust_outlier_counts_hand_computed(spark):
    """9 values of median 50, MAD 10 -> |v-50| > 30 flags exactly the
    two extremes; a second group with zero MAD flags every off-median
    value (the degenerate-constant case a mean/sigma score misses)."""
    from user_behavior_spark_pipeline_spark.operators.stats import (
        robust_outlier_counts,
    )

    rows = [("a", v / 100) for v in (20, 40, 45, 50, 50, 55, 60, 81, 200)]
    rows += [("b", 1.0)] * 4 + [("b", 1.01)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    got = {
        r["event_type"]: (r["n_rows"], r["n_outliers"])
        for r in robust_outlier_counts(df).collect()
    }
    # group a: cents 20..200, median 50, deviations 30,10,5,0,0,5,10,31,150
    #          -> MAD 10 -> threshold 30 -> outliers: 81 (31) and 200 (150)
    assert got["a"] == (9, 2)
    # group b: median 100, MAD 0 -> any deviation > 0 is an outlier
    assert got["b"] == (5, 1)
