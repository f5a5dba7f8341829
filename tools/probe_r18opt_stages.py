#!/usr/bin/env python
"""One instrumented q_curation_pipeline run with the Spark UI enabled;
dumps per-stage executorRunTime / executorCpuTime / shuffle bytes via the
REST API so the trim's cost lands on named stages (guide §7.1)."""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import SparkSession

    from tikv_data_compare_spark.session import ship_package

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("probe-stages")
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

    import time

    t0 = time.time()
    df = qe.q_curation_pipeline(spark, sf_dir)
    t_build = time.time() - t0
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    t_force = time.time() - t0
    print(json.dumps({"build_sec": round(t_build, 2), "force_sec": round(t_force, 2)}))

    app = json.load(urllib.request.urlopen("http://localhost:4049/api/v1/applications"))
    app_id = app[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"http://localhost:4049/api/v1/applications/{app_id}/stages?status=complete"
        )
    )
    rows = []
    for s in stages:
        rows.append(
            {
                "stage": s["stageId"],
                "name": s["name"].split("\n")[0][:70],
                "run_ms": s["executorRunTime"],
                "cpu_ms": s["executorCpuTime"] // 1_000_000,
                "in_mb": round(s["inputBytes"] / 1e6, 1),
                "sh_r_mb": round(s["shuffleReadBytes"] / 1e6, 1),
                "sh_w_mb": round(s["shuffleWriteBytes"] / 1e6, 1),
                "tasks": s["numCompleteTasks"],
            }
        )
    rows.sort(key=lambda r: -r["run_ms"])
    for r in rows[:30]:
        print(json.dumps(r))
    total = sum(r["run_ms"] for r in rows)
    print(json.dumps({"total_executor_run_ms": total, "n_stages": len(rows)}))

    # per-plan-node metrics of the heaviest SQL executions: where each
    # query's time actually lands (scan / explode / join / agg)
    sqls = json.load(
        urllib.request.urlopen(
            f"http://localhost:4049/api/v1/applications/{app_id}/sql?details=true&length=200"
        )
    )
    sqls.sort(key=lambda s: -s.get("duration", 0))
    for s in sqls[:3]:
        print(json.dumps({"sql_id": s["id"], "duration_ms": s["duration"], "desc": s["description"][:60]}))
        for node in s.get("nodes", []):
            mets = {
                m["name"]: m["value"]
                for m in node.get("metrics", [])
                if any(t in m["name"] for t in ("time total", "output rows", "time in"))
            }
            tt = mets.get("time total (min, med, max (stageId: taskId))", "") or mets.get("time total", "")
            rows_out = mets.get("number of output rows", "")
            if tt or rows_out:
                print(json.dumps({"node": node["nodeName"][:40], "time": str(tt)[:60], "rows": str(rows_out)[:20]}))


if __name__ == "__main__":
    main()
