"""Driver-compare replica: every registered query with an oracle must match
its DuckDB twin on row count, column names, and values (SURVEY.md §5)."""

from __future__ import annotations

import pytest

from user_behavior_spark_pipeline_spark.registry import ORACLES, QUERIES

from .oracle_utils import assert_frames_match, duckdb_connection


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


def test_every_oracle_has_a_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, oracle_con, name):
    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    oracle_pdf = oracle_con.execute(ORACLES[name]).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_query_schema_is_driver_hashable(spark, sf_dir, name):
    """No array/map/struct columns in any driver-checked output: the
    driver's pandas canonicalizer sorts raw cell values and raises
    'unhashable type' on non-scalars (r02's x_multimodal_decode_q
    failure). Schema-level pin — analysis only, no execution."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    schema = QUERIES[name](spark, sf_dir).schema
    bad = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"{name}: driver-checked output has non-scalar columns {bad}; "
        "explode or stringify them (and mirror in the oracle SQL)"
    )


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
