"""Delta-style log replay (operators/deltalog): action explode,
last-action-wins semantics, corrupt-line quarantine, re-add after
remove, plan nativeness."""

from __future__ import annotations

from user_behavior_spark_pipeline_spark.operators.deltalog import (
    delta_live_files,
    delta_log_actions,
    synth_delta_logs,
)


def test_replay_closed_form(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    live = {
        (r.table_id, r.path): r.size_bytes
        for r in delta_live_files(synth_delta_logs(docs)).collect()
    }
    for d in range(6):
        V = d % 3 + 1
        assert live[(d, "part-0-1")] == 101
        assert live[(d, "part-0-2")] == 102
        assert live[(d, f"part-{V}-0")] == 100 + V
        assert (d, "part-0-0") not in live  # removed at v1
        assert len([k for k in live if k[0] == d]) == 3


def test_readd_after_remove_wins(spark):
    """A path removed at v1 and RE-ADDED at v2 is live — ordering is by
    (version, action_idx), not by action kind."""
    logs = spark.createDataFrame(
        [
            (1, 0, '{"add": {"path": "p", "size": 5, "dataChange": true}}'),
            (1, 1, '{"remove": {"path": "p", "dataChange": true}}'),
            (1, 2, '{"add": {"path": "p", "size": 9, "dataChange": true}}'),
        ],
        "table_id long, version int, payload string",
    )
    rows = delta_live_files(logs).collect()
    assert [(r.path, r.size_bytes) for r in rows] == [("p", 9)]
    # and within ONE commit, the later action wins too
    logs2 = spark.createDataFrame(
        [
            (1, 0,
             '{"remove": {"path": "q", "dataChange": true}}\n'
             '{"add": {"path": "q", "size": 7, "dataChange": true}}'),
        ],
        "table_id long, version int, payload string",
    )
    (r,) = delta_live_files(logs2).collect()
    assert (r.path, r.size_bytes) == ("q", 7)


def test_corrupt_lines_and_unknown_actions(spark):
    logs = spark.createDataFrame(
        [
            (1, 0,
             '{"commitInfo": {"op": "WRITE"}}\n'
             "this is not json\n"
             '{"add": {"path": "a", "size": 1, "dataChange": true}}\n'
             "\n"),
        ],
        "table_id long, version int, payload string",
    )
    acts = delta_log_actions(logs).collect()
    kinds = sorted(r.action for r in acts)
    assert kinds == ["add", "corrupt", "corrupt"]
    # corrupt/unknown lines never affect the live set
    (r,) = delta_live_files(logs).collect()
    assert r.path == "a"


def test_plan_is_python_free(spark):
    docs = spark.createDataFrame([(1,)], "doc_id long")
    logs = spark.createDataFrame(
        [(1, 0, '{"add": {"path": "a", "size": 1, "dataChange": true}}')],
        "table_id long, version int, payload string",
    )
    plan = (
        delta_live_files(logs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# Checkpoint bootstrap path (r12)
# ---------------------------------------------------------------------------


def test_checkpoint_state_matches_python_replay():
    """The checkpoint parquet's content IS the replayed state: decode
    it with pyarrow directly and compare to a plain-Python replay."""
    import io

    import pyarrow.parquet as pq

    from user_behavior_spark_pipeline_spark.operators.deltalog import (
        _state_after,
        synth_delta_checkpoint_bytes,
    )

    for d in (0, 1, 2, 5):
        c = d % 3
        tbl = pq.read_table(
            io.BytesIO(synth_delta_checkpoint_bytes(d, c))
        ).to_pylist()
        live = {
            r["add"]["path"]: r["add"]["size"]
            for r in tbl
            if r["add"] and r["add"]["path"]
        }
        tombs = {
            r["remove"]["path"]
            for r in tbl
            if r["remove"] and r["remove"]["path"]
        }
        want_live, want_tombs = _state_after(d, c)
        assert live == want_live and tombs == want_tombs, d


def test_checkpoint_pointer_and_tail_are_load_bearing(spark):
    """Using the stale checkpoint (C-1) + tail must resurrect
    part-(V-2)-0 — i.e. the pointer version genuinely selects state;
    and dropping the checkpoint entirely loses the v0 survivors."""
    from pyspark.sql import functions as F

    from user_behavior_spark_pipeline_spark.operators.deltalog import (
        delta_live_files_from_checkpoint,
        synth_delta_checkpoint_fixture,
    )

    docs = spark.createDataFrame([(5,)], "doc_id long")  # V=3, C=2
    ptr, cks, tail = synth_delta_checkpoint_fixture(docs)
    good = {
        r.path
        for r in delta_live_files_from_checkpoint(ptr, cks, tail).collect()
    }
    assert good == {"part-0-1", "part-0-2", "part-3-0"}
    # roll the pointer back to the stale checkpoint
    stale_ptr = ptr.withColumn(
        "payload", F.lit('{"version": 1, "size": 1}')
    )
    stale = {
        r.path
        for r in delta_live_files_from_checkpoint(
            stale_ptr, cks, tail
        ).collect()
    }
    assert "part-1-0" in stale and stale != good
    # checkpoint withheld: only the tail's adds survive
    no_ck = {
        r.path
        for r in delta_live_files_from_checkpoint(
            ptr, cks.filter("version < 0"), tail
        ).collect()
    }
    assert no_ck == {"part-3-0"}


def test_corrupt_checkpoint_quarantines(spark):
    from pyspark.sql import functions as F

    from user_behavior_spark_pipeline_spark.operators.deltalog import (
        checkpoint_actions,
        synth_delta_checkpoint_fixture,
    )

    docs = spark.createDataFrame([(1,)], "doc_id long")
    _ptr, cks, _tail = synth_delta_checkpoint_fixture(docs)
    broken = cks.withColumn("payload", F.lit(b"PAR1 not a footer"))
    rows = checkpoint_actions(broken).collect()
    assert rows and all(r.parse_error is not None for r in rows)
