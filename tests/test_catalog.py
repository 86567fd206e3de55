"""Catalog/DDL surface: external-table round trip, SHOW TABLES, DESCRIBE,
temp view + CTAS (SURVEY.md §2.3)."""

from __future__ import annotations

from user_behavior_spark_pipeline_spark.catalog import (
    create_external_parquet_table,
    ctas,
    describe_table,
    show_tables,
)
from user_behavior_spark_pipeline_spark.operators.ingest import validate_events
from user_behavior_spark_pipeline_spark.sources.generator import load_kafka_records


def test_external_table_roundtrip(spark, sf_dir, tmp_path):
    valid = validate_events(load_kafka_records(spark, sf_dir))
    out = str(tmp_path / "valid_events")
    valid.write.mode("overwrite").partitionBy("event_type").parquet(out)
    create_external_parquet_table(spark, "t_roundtrip", out, repair=True)
    assert spark.table("t_roundtrip").count() == valid.count()
    # external semantics: drop never deletes the data
    spark.sql("DROP TABLE t_roundtrip")
    assert spark.read.parquet(out).count() == valid.count()


def test_show_tables_and_describe(spark, sf_dir, tmp_path):
    valid = validate_events(load_kafka_records(spark, sf_dir))
    out = str(tmp_path / "ve")
    valid.write.mode("overwrite").parquet(out)
    create_external_parquet_table(spark, "t_describe", out)
    tables = {r["tableName"] for r in show_tables(spark).collect()}
    assert "t_describe" in tables
    cols = {r["col_name"] for r in describe_table(spark, "t_describe").collect()}
    assert {"raw_event", "event_type", "direction", "event_detail"} <= cols
    spark.sql("DROP TABLE t_describe")


def test_tempview_and_ctas(spark, sf_dir):
    valid = validate_events(load_kafka_records(spark, sf_dir))
    valid.createOrReplaceTempView("extracted_events")
    ctas(
        spark,
        "t_ctas",
        "SELECT event_type, COUNT(*) AS n FROM extracted_events GROUP BY 1",
    )
    got = {r["event_type"]: r["n"] for r in spark.table("t_ctas").collect()}
    assert set(got) == {"sword_event", "guild_event"}
    assert sum(got.values()) == valid.count()
    spark.sql("DROP TABLE t_ctas")
