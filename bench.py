"""Benchmark harness — times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized through the noop datasource (no driver-side
collect bottleneck, no disk write) — i.e. we time scan + compute + shuffle,
which is what scales."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)

    from user_behavior_spark_pipeline_spark.registry import QUERIES
    from user_behavior_spark_pipeline_spark.session import get_spark

    spark = get_spark(app_name="ubsp-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen/file-index paths so the first timed query isn't
    # charged for session bootstrap
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.read.parquet(f"{sf_dir}/events.parquet").count()

    bench_names = sorted(QUERIES)
    timings: dict[str, float] = {}
    for name in bench_names:
        # isolate per-query cost: collect garbage left by the previous query
        # (memory sinks, state stores) before starting the clock
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
