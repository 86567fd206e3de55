"""Guard against driver-session config gaps (VERDICT r1 #7).

The correctness driver builds its OWN vanilla ``SparkSession.builder
.getOrCreate()`` — it never calls our ``session.get_spark``. Round 1 lost 19
queries because ``spark.sql.legacy.parquet.nanosAsLong`` lived only in the
builder. This test runs a registry query end-to-end in a SUBPROCESS with a
vanilla session (a same-process test would silently reuse the suite's
configured session), so that class of failure can't recur silently.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
import __spark_entry__ as entry

qs = entry.queries()
# One events-reading query (the round-1 failure class) and one kafka-records
# query (reads events through the generator path).
for key in ("ref_count", "ref_groupby_direction"):
    df = qs[key](spark, {sf_dir!r})
    rows = df.count()
    assert rows >= 0, key
    print("OK", key, rows)
spark.stop()
"""


def test_registry_queries_run_on_vanilla_session(sf_dir):
    script = _SCRIPT.format(repo=REPO_ROOT, sf_dir=sf_dir)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO_ROOT,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "OK ref_count" in proc.stdout
    assert "OK ref_groupby_direction" in proc.stdout
