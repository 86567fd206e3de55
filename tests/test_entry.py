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
