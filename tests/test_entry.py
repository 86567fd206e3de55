"""Smoke test of the driver contract surface."""

from __future__ import annotations

import importlib


def test_entry_runs(spark):
    mod = importlib.import_module("__spark_entry__")
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert {f.name for f in df.schema.fields} == {
        "event_type",
        "direction",
        "num_events",
    }
    total = sum(r["num_events"] for r in rows)
    assert total > 0


def test_contract_shapes():
    mod = importlib.import_module("__spark_entry__")
    qs = mod.queries()
    os_ = mod.oracle_sql()
    assert qs, "queries() must not be empty"
    assert set(os_) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name


def test_rotation_spends_check_slots_on_unverified_queries():
    """The driver hash-checks only the first 50 queries() entries: the
    rotation must order never-checked (oracle-backed first) -> checked-not-
    green -> green, derived from the CORRECTNESS_r*.json history files."""
    import glob
    import json
    import os

    from user_behavior_spark_pipeline_spark.registry import ORACLES, QUERIES

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    status = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        for name, row in json.load(open(path)).items():
            if isinstance(row, dict):
                if row.get("hash_match") is True:
                    status[name] = "green"
                else:
                    status.setdefault(name, "checked")
    keys = list(QUERIES)
    rank = {"never": 0, "checked": 1, "green": 2}
    classes = [rank[status.get(k, "never")] for k in keys]
    assert classes == sorted(classes), "history classes out of order"
    # oracle-backed never-checked precede rows-only never-checked
    never = [k for k in keys if k not in status]
    oracle_flags = [k not in ORACLES for k in never]
    assert oracle_flags == sorted(oracle_flags), "rows-only before oracle-backed"
