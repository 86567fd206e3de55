"""Data-quality expectations: planted-violation fixtures with exact
hand-countable answers — the suite must count precisely, not roughly."""

from __future__ import annotations

from pyspark.sql import functions as F

from user_behavior_spark_pipeline_spark.operators.dq import (
    expectations_report,
    referential_check,
    row_checks,
)


def test_row_checks_count_planted_violations(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 150.0), (None, "a", 7.0), (2, "zzz", -1.0)],
        "id long, cat string, v double",
    )
    out = row_checks(
        df,
        {
            "id_not_null": F.col("id").isNotNull(),
            "cat_accepted": F.col("cat").isin("a", "b"),
            "v_in_0_100": F.col("v").between(0, 100),
        },
        uniques=["id"],
    )
    got = {r["check_name"]: r["n_violations"] for r in out.collect()}
    assert got == {
        "id_not_null": 1,      # the None id
        "cat_accepted": 1,     # the 'zzz'
        "v_in_0_100": 2,       # 150.0 and -1.0
        "unique_id": 1,        # id=2 twice -> count 3 non-null, 2 distinct
    }


def test_row_checks_null_expectation_counts_as_violation(spark):
    # a NULL comparison result means the expectation was NOT met
    df = spark.createDataFrame([(None,), (5.0,)], "v double")
    out = row_checks(df, {"v_le_10": F.col("v") <= 10})
    assert out.collect()[0]["n_violations"] == 1


def test_referential_check_counts_orphan_keys_not_rows(spark):
    child = spark.createDataFrame(
        [(1,), (1,), (2,), (99,), (99,), (99,), (None,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    out = referential_check("fk_check", child, "fk", parent, "pk").collect()
    # 99 is one orphan KEY (3 rows); NULL fk is excluded by contract
    assert out[0]["check_name"] == "fk_check"
    assert out[0]["n_violations"] == 1


def test_report_is_sorted_and_union_complete(spark):
    a = spark.createDataFrame([(1,)], "x long")
    r = expectations_report(
        [
            row_checks(a, {"z_last": F.col("x") > 0}),
            row_checks(a, {"a_first": F.col("x") > 100}),
        ]
    ).collect()
    assert [row["check_name"] for row in r] == ["a_first", "z_last"]
    assert [row["n_violations"] for row in r] == [1, 0]
