"""Multi-dimensional aggregation: ROLLUP / CUBE / GROUPING SETS.

The reference has none of these (SURVEY.md §2.5 gap map) — they're part of
the "complete analytics engine" contract. All three are native Catalyst
`Expand`-based operators: the input is replicated once per grouping set
map-side and aggregated in ONE shuffle, not one query per subtotal level —
at 100 TB a rollup over k levels costs one pass, not k.

Subtotal rows carry NULL in the rolled-up columns; `grouping_id()` is
emitted so consumers (and the DuckDB oracle, via GROUPING()) can tell a
subtotal NULL from a data NULL. The grouping columns used here are
non-nullable in the fixtures, which keeps the distinction unambiguous for
hash comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .joins import money_e4, sum_money


def orders_rollup(orders: DataFrame) -> DataFrame:
    """ROLLUP (orderstatus, orderpriority): per-pair, per-status, and grand
    totals in one pass."""
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # grand-total cell sums the whole table — decimal widening
            # (see joins.sum_money) or it overflows int64 at ~SF4000
            sum_money(money_e4(F.col("o_totalprice"))).alias("total_x10000"),
            (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority"))
            .cast("long")
            .alias("gid"),
        )
    )


def lineitem_cube(lineitem: DataFrame) -> DataFrame:
    """CUBE (returnflag, linestatus): all 2^2 grouping sets in one pass."""
    return (
        lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("qty_x100"),
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
            .cast("long")
            .alias("gid"),
        )
    )


def orders_grouping_sets(spark, orders: DataFrame) -> DataFrame:
    """Explicit GROUPING SETS ((status), (priority), ()) via Spark SQL —
    the general form ROLLUP/CUBE desugar to."""
    orders.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(1) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 10000) AS DECIMAL(38,0)))
                    AS BIGINT) AS total_x10000,
               CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                    AS BIGINT) AS gid
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def mergeable_daily_rollup(events: DataFrame) -> DataFrame:
    """The mergeable per-(day, type) rollup row: COUNT and exact-cents SUM
    — both associative, so two rollups over disjoint row sets merge by
    key-wise addition into exactly the rollup of the union (the property
    :func:`merge_rollups` exploits)."""
    from pyspark.sql import functions as F

    return events.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias(
            "total_cents"
        ),
    )


def merge_rollups(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Incremental aggregate maintenance: fold a late-arriving delta's
    rollup into the standing rollup WITHOUT re-scanning base history —
    union the two (small) rollup tables and re-aggregate by key, adding
    the mergeable measures.

    THE pattern that makes a 100 TB daily-metrics pipeline affordable:
    the standing rollup is ~(days × types) rows regardless of fact size,
    the delta pays only its own scan + a rollup-sized shuffle, and late
    data lands in its TRUE event-time day (contrast processing-time
    pipelines that misfile it — README.md's reference counts by arrival).
    Works for any associative measure (counts, exact-integer sums,
    HLL/KLL sketch blobs via their union aggs — see
    distinct_users_mergeable_sketch); averages/medians must be carried
    as (sum, count) / sketch, never as the finished ratio. Equality with
    a full recompute is not a convention but a theorem (associativity +
    commutativity of the measures), which the registered query's oracle
    states literally: the full GROUP BY over base ∪ delta."""
    from pyspark.sql import functions as F

    return (
        base.unionByName(delta)
        .groupBy("day", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("total_cents").alias("total_cents"),
        )
    )
