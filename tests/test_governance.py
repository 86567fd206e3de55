"""Governance operators: hand-countable fixtures — the audit's counts
must equal the purge primitive's actual row movements exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from user_behavior_spark_pipeline_spark.operators.governance import (
    erasure_audit,
    k_anonymity_report,
    purge,
)


def test_k_anonymity_hand_computed(spark):
    rows = (
        [("US", "A")] * 5      # class of 5 — safe at k=5
        + [("US", "B")] * 2    # class of 2 — at risk
        + [("DE", "A")]        # class of 1 — at risk
        + [(None, "A")] * 3    # NULL QI forms its own (at-risk) class
    )
    df = spark.createDataFrame(rows, "nation string, seg string")
    got = k_anonymity_report(df, ["nation", "seg"], k=5).collect()[0]
    assert got["k"] == 5
    assert got["n_classes"] == 4
    assert got["n_small_classes"] == 3
    assert got["n_rows_at_risk"] == 6      # 2 + 1 + 3
    assert got["min_class_size"] == 1


def test_erasure_audit_matches_purge_and_conserves_rows(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d"), (None, "e")],
        "uid long, payload string",
    )
    # subject 1 appears TWICE, as an erasure-request log replay would
    # deliver it: the audit must not row-multiply (code-review r07)
    tomb = spark.createDataFrame([(1,), (1,), (99,)], "subject_id long")
    audit = {
        r["table_name"]: r
        for r in erasure_audit({"t": (df, "uid")}, tomb).collect()
    }["t"]
    purged = purge(df, "uid", tomb)
    assert audit["rows_before"] == 5
    assert audit["rows_purged"] == 2
    assert audit["rows_after"] == 3 == purged.count()
    assert audit["rows_before"] == audit["rows_purged"] + audit["rows_after"]
    # NULL subject keys survive (NOT-IN-with-non-null-list semantics)
    assert purged.filter(F.col("uid").isNull()).count() == 1
    # the purged frame contains no tombstoned subject
    assert purged.filter(F.col("uid") == 1).count() == 0
