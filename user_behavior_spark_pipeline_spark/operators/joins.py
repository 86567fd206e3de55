"""Equi-joins over the star schema (OP-X-JOIN, SURVEY.md §2.5).

The reference has no joins — its README names them as the next step ("If we
had other tables available we could also do joins ... shops, players and
events" — README.md:819). These operators provide that surface over the
TPC-H-ish star schema, designed for 100 TB:

- dimension tables (region/nation/customer/part/supplier) are BROADCAST —
  the fact table (lineitem/orders) never shuffles for the join;
- aggregation happens on the join output with map-side partial aggregation,
  so the only shuffle carries (group-key, partial-sum) pairs;
- money aggregates are exact integer sums of per-row scaled-and-rounded
  values (see registry docstring: cross-engine double-sum order isn't
  deterministic, per-row IEEE arithmetic is).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def money_e4(expr: Column) -> Column:
    """Exact fixed-point representation: round(expr * 1e4) as bigint."""
    return F.round(expr * F.lit(10000)).cast("long")


def revenue_per_region_nation(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
    nation: DataFrame, region: DataFrame,
) -> DataFrame:
    """4-way star join: revenue = sum(extendedprice * (1 - discount)) per
    (region, nation). Dims broadcast; one shuffle total (the final group-by).
    """
    rev = money_e4(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(rev).alias("revenue_x10000"),
            F.count(F.lit(1)).alias("num_items"),
        )
    )


def revenue_per_brand(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Explicit broadcast dimension join (OP-X-JOIN broadcast variant)."""
    rev = money_e4(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum(rev).alias("revenue_x10000"),
            F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("qty_x100"),
        )
    )


def customers_with_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left-semi join (EXISTS). The orders side is reduced to its join key
    before the join — Catalyst prunes columns; at scale prefer a bloom-filter
    or broadcast of the distinct-key set when it fits."""
    return customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left-anti join (NOT EXISTS)."""
    return customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


def customers_without_big_orders(
    customer: DataFrame, orders: DataFrame, threshold: float = 450000.0
) -> DataFrame:
    """Anti join against a filtered right side — the filter is applied BEFORE
    the join (pushed into the orders scan), shrinking the build side."""
    big = orders.filter(F.col("o_totalprice") > threshold)
    return customer.join(
        big, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")
