#!/usr/bin/env python
"""Decompose q_curation_pipeline wall into DRIVER time vs EXECUTOR time.

VERDICT r18 "what's wrong" #1: ~3-4 s of every sf0.1 curation call is
Catalyst analysis/optimization of the ~8,700-line flags+trim plan (the
8-core run beats the 32-core run).  This probe measures that directly:

- wall of each curate() phase (build, funnel agg, kept materialize,
  final forced collect);
- total executor task time (stage API) for the same window;
- "driver time" = wall - max-concurrent-executor time proxy, reported
  as wall alongside the summed stage run times.

Run once per code state (before/after the lineage truncation) at idle:
    python tools/probe_r19_curation_driver.py | tee -a tools/probe_r19_curation_driver_runs.jsonl
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import SparkSession

    from tikv_data_compare_spark.session import ship_package

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("probe-curation-driver")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    ship_package(spark)

    from tikv_data_compare_spark import queries_ext as qe
    from tikv_data_compare_spark.operators import curate as cur
    import bench as bench_mod

    def stage_totals():
        app = json.load(
            urllib.request.urlopen("http://localhost:4049/api/v1/applications")
        )
        app_id = app[0]["id"]
        stages = json.load(
            urllib.request.urlopen(
                f"http://localhost:4049/api/v1/applications/{app_id}/stages?status=complete"
            )
        )
        return {
            "n_stages": len(stages),
            "run_ms": sum(s["executorRunTime"] for s in stages),
            # wall the executors were actually busy can't exceed run/32;
            # report both so driver share = wall - run/32 is a lower bound
        }

    # warm the JVM like the bench does
    bench_mod.run_forced(qe.q_curation_pipeline(spark, sf_dir))

    results = []
    for it in range(3):
        spark.catalog.clearCache()
        s0 = stage_totals()
        t0 = time.time()
        df = qe.q_curation_pipeline(spark, sf_dir)
        t_build = time.time() - t0
        t0 = time.time()
        bench_mod.run_forced(df)
        t_force = time.time() - t0
        s1 = stage_totals()
        run_s = (s1["run_ms"] - s0["run_ms"]) / 1000.0
        wall = t_build + t_force
        results.append(
            {
                "iter": it,
                "wall_sec": round(wall, 3),
                "build_sec": round(t_build, 3),
                "force_sec": round(t_force, 3),
                "stage_run_sec": round(run_s, 3),
                "exec_busy_floor_sec": round(run_s / 32.0, 3),
                "driver_share_min_sec": round(wall - run_s / 32.0, 3),
                "stage_timings": dict(cur.LAST_STAGE_TIMINGS),
            }
        )
        print(json.dumps(results[-1]))
    best = min(results, key=lambda r: r["wall_sec"])
    print(json.dumps({"best": best, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
