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
