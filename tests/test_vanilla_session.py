"""Guard against driver-session config gaps (VERDICT r1 #7).

The correctness driver builds its OWN vanilla ``SparkSession.builder
.getOrCreate()`` — it never calls our ``session.get_spark``. Round 1 lost 19
queries because ``spark.sql.legacy.parquet.nanosAsLong`` lived only in the
builder. This test runs registry queries end-to-end in a SUBPROCESS with a
vanilla session (a same-process test would silently reuse the suite's
configured session), sampling every query class the driver checks first:
events-reading, kafka-double, streaming, bucketed CTAS, catalog DDL,
multimodal and approx. Also asserts the vanilla warehouse default
(./spark-warehouse in CWD) is never written to.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_KEYS = (
    "ref_count",  # events parquet read
    "ref_groupby_direction",  # kafka-double mapping
    "x_event_session",  # session windows over NTZ ts
    "x_stream_windowed",  # streaming watermark + memory sink
    "x_join_bucketed",  # bucketed CTAS (explicit /tmp location)
    "ref_catalog_table",  # DDL round trip
    "x_multimodal_meta",  # binary payload + metadata pruning
    "x_approx_distinct",  # sketch aggregates
)

_SCRIPT = """
import os, sys
sys.path.insert(0, {repo!r})
os.chdir({workdir!r})  # so a warehouse leak would be visible here, not in the repo
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
import __spark_entry__ as entry

qs = entry.queries()
for key in {keys!r}:
    df = qs[key](spark, {sf_dir!r})
    rows = df.count()
    assert rows >= 0, key
    print("OK", key, rows, flush=True)
spark.stop()
# Spark creates an EMPTY spark-warehouse dir for the default database on
# first catalog use — that's session bootstrap, not a leak. Fail only if a
# query actually materialized table data there.
wh = os.path.join({workdir!r}, "spark-warehouse")
leaked = os.listdir(wh) if os.path.isdir(wh) else []
assert not leaked, f"tables written into the vanilla CWD warehouse: {{leaked}}"
print("NO_WAREHOUSE_LEAK")
"""


def test_registry_queries_run_on_vanilla_session(sf_dir, tmp_path):
    script = _SCRIPT.format(
        repo=REPO_ROOT, sf_dir=sf_dir, keys=_KEYS, workdir=str(tmp_path)
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO_ROOT,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    for key in _KEYS:
        assert f"OK {key}" in proc.stdout, proc.stdout
    assert "NO_WAREHOUSE_LEAK" in proc.stdout
