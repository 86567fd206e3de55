"""Catalog / DDL surface (OP-DDL-HIVE, OP-TEMPVIEW-CTAS, OP-Q-SHOW-TABLES,
OP-Q-DESCRIBE — SURVEY.md §2.3/§2.4).

The reference drops/creates a Hive EXTERNAL parquet table over the streaming
sink directory (README.md:394-411) so Presto can query it. The preserved
contract is "a parquet directory is also a catalog table"; Hive + thrift is
replaced by the in-process Spark catalog: ``CREATE TABLE ... USING PARQUET
LOCATION ...`` is unmanaged (external) — dropping it never deletes data —
and any engine that reads the catalog sees the same directory."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def create_external_parquet_table(
    spark: SparkSession, name: str, location: str, repair: bool = False
) -> None:
    """OP-DDL-HIVE: DROP IF EXISTS + CREATE ... USING PARQUET LOCATION
    (the README.md:394-411 DDL, minus the Hive metastore). Schema AND
    hive-style partition columns are inferred from the directory layout —
    an explicit PARTITIONED BY requires an explicit column list, so we let
    inference do both."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(
        f"CREATE TABLE {name} USING PARQUET LOCATION '{location}' "
        "TBLPROPERTIES ('parquet.compress' = 'SNAPPY')"
    )
    if repair:
        spark.sql(f"MSCK REPAIR TABLE {name}")


def ctas(spark: SparkSession, name: str, select_sql: str) -> None:
    """OP-TEMPVIEW-CTAS (rpg_spark_stream.py:75-83,100-108)."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(f"CREATE TABLE {name} AS {select_sql}")


def show_tables(spark: SparkSession) -> DataFrame:
    return spark.sql("SHOW TABLES")


def describe_table(spark: SparkSession, name: str) -> DataFrame:
    return spark.sql(f"DESCRIBE TABLE {name}")
