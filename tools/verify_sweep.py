#!/usr/bin/env python
"""Pre-commit oracle-parity sweep — the driver-compare replica.

Usage:
    python tools/verify_sweep.py                 # full catalog at sf0.01
    python tools/verify_sweep.py q1 q2 ...       # named queries, TWO scales

Named (touched) queries run at BOTH sf0.001 and sf0.01: the r13 LZW
encoder tail bug (`a0c16ff`) was invisible at sf0.01 but caught by the
sf0.001 oracle-parity test — the two scales exercise different boundary
inputs (doc_id slices differ), so touched queries must pass both before
a commit (VERDICT r13 #7). The full-catalog mode stays single-scale:
it is the ~3.5 min regression net, not the boundary hunt.

Exit status is the number of failures (0 = green).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __spark_entry__ as e  # noqa: E402
from user_behavior_spark_pipeline_spark.materialize import release_shared  # noqa: E402
from user_behavior_spark_pipeline_spark.session import get_spark  # noqa: E402
from tests.oracle_utils import assert_frames_match, duckdb_connection  # noqa: E402

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


def main() -> int:
    only = set(a for a in sys.argv[1:] if not a.startswith("-"))
    scales = ["sf0.01"] if not only else ["sf0.001", "sf0.01"]
    spark = get_spark(app_name="verify_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    print("entry rows:", len(e.entry(spark).collect()), flush=True)
    qs, osql = e.queries(), e.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"UNKNOWN queries: {sorted(unknown)}", flush=True)
        return len(unknown)
    fails: list[str] = []
    for sf in scales:
        sf_dir = os.path.join(TESTDATA, sf)
        con = duckdb_connection(sf_dir)
        for i, name in enumerate(qs):
            if only and name not in only:
                continue
            t0 = time.time()
            try:
                spdf = qs[name](spark, sf_dir).toPandas()
                if name in osql:
                    assert_frames_match(
                        spdf, con.execute(osql[name]).df(), name
                    )
                    tag = "OK"
                else:
                    assert len(spdf) >= 0
                    tag = "ROWS-ONLY"
                print(
                    f"{tag} {sf} {i} {name} ({time.time() - t0:.1f}s)",
                    flush=True,
                )
            except Exception as ex:
                fails.append(f"{sf}:{name}")
                print(f"FAIL {sf} {i} {name}: {ex}", flush=True)
            release_shared()
    print("DONE fails=", fails, flush=True)
    spark.stop()
    return len(fails)


if __name__ == "__main__":
    sys.exit(main())
