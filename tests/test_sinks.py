"""Sink layout properties: partition pruning and shuffle-free co-bucketed
joins — the physical contracts that matter at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from user_behavior_spark_pipeline_spark.plans import explain_str
from user_behavior_spark_pipeline_spark.sinks import (
    write_bucketed_table,
    write_partitioned,
)
from user_behavior_spark_pipeline_spark.sources.tables import load_table


def test_partitioned_write_enables_partition_pruning(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "by_type")
    write_partitioned(ev, out, ["event_type"])
    pruned = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    plan = explain_str(pruned)
    # partition filter handled at planning: no event_type data filter remains
    assert "PartitionFilters" in plan and "event_type" in plan
    assert pruned.count() == ev.filter("event_type = 'purchase'").count()


def test_cobucketed_join_has_no_exchange(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    write_bucketed_table(spark, orders, "b_orders", "o_custkey", 8)
    write_bucketed_table(
        spark, customer.withColumnRenamed("c_custkey", "o_custkey"), "b_customer",
        "o_custkey", 8,
    )
    joined = (
        spark.table("b_orders")
        .join(spark.table("b_customer"), "o_custkey")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # force SMJ path so bucketing (not broadcast) carries the join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = explain_str(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert "Exchange" not in plan, plan[:2000]
    spark.sql("DROP TABLE b_orders")
    spark.sql("DROP TABLE b_customer")


def test_max_records_per_file_bounds_files(spark, sf_dir, tmp_path):
    import glob

    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "bounded")
    write_partitioned(
        ev.repartition(1), out, ["event_type"], max_records_per_file=100
    )
    n_rows = ev.count()
    files = glob.glob(f"{out}/**/*.parquet", recursive=True)
    assert len(files) >= n_rows // 100
