#!/usr/bin/env python
"""Measure what ANN index compaction actually buys (VERDICT r13 task 7).

The r13 compaction claim — "bounded file count + cell-clustered row groups
→ the selective probe reads ~n_probe/n_cells of the index" — shipped with
a correctness test but no measurement.  This probe builds an index from a
base slice of $SPARK_GRAFT_SF_DIR/embeddings.parquet (default sf1, 20k
vectors), appends the rest in many small epochs (the fragment-accumulation
shape a long-lived stream produces), then measures the SAME query batch:

  - before compaction  (many append fragments, no clustering)
  - after  compact_index(target_files=8)

recording vectors/ parquet file count, query wall (min-of-N), and the
container cgroup cpu-second delta of the best run.  Prints one JSON line
for BASELINE.md.

Usage: python tools/probe_compaction.py [n_epochs] [n_queries]
"""
from __future__ import annotations

import gc
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def loadavg_1m() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def container_cpu_sec() -> float:
    try:
        with open("/sys/fs/cgroup/cpuacct/cpuacct.usage") as f:
            return int(f.read()) / 1e9
    except (OSError, ValueError):
        pass
    with open("/sys/fs/cgroup/cpu.stat") as f:
        for line in f:
            if line.startswith("usage_usec"):
                return int(line.split()[1]) / 1e6
    return -1.0


def main():
    n_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    from pyspark.sql import functions as F

    from tikv_data_compare_spark.functions import fsutil
    from tikv_data_compare_spark.operators.ann_index import (
        append_to_index,
        build_ann_index,
        compact_index,
        load_ann_index,
        topk_index,
    )
    from tikv_data_compare_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    spark = get_spark("probe_compaction", cpus=cpus)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n_total = emb.count()
    n_base = max(1024, n_total // 4)
    path = fsutil.scratch_dir(prefix="probe_compact_") + "/index"

    build_ann_index(
        emb.filter(F.col("vec_id") < n_base), path,
        n_cells=16, m=8, k_codes=32,
    )
    # fragment accumulation: N small appends, the streaming-epoch shape
    per = max(1, (n_total - n_base) // n_epochs)
    for i in range(n_epochs):
        lo = n_base + i * per
        hi = n_total if i == n_epochs - 1 else lo + per
        batch = emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        if batch.limit(1).count():
            append_to_index(batch, path, on_drift="warn")

    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def n_files() -> int:
        return len(glob.glob(f"{path}/vectors/*.parquet"))

    def run_queries() -> tuple[float, float, list[float]]:
        idx = load_ann_index(spark, path)
        best, best_cpu, walls = None, -1.0, []
        for _ in range(3):
            spark.catalog.clearCache()
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            c0 = container_cpu_sec()
            t0 = time.time()
            topk_index(
                idx, queries, k=5, n_probe=4, rerank=100, emb_for_rerank=emb
            ).count()
            dt = time.time() - t0
            walls.append(round(dt, 3))
            if best is None or dt < best:
                best, best_cpu = dt, round(container_cpu_sec() - c0, 3)
        return round(best, 3), best_cpu, walls

    out = {
        "sf_dir": sf_dir, "n_vectors": n_total, "n_epochs": n_epochs,
        "n_queries": n_queries, "load_start": loadavg_1m(),
    }
    out["files_before"] = n_files()
    out["query_wall_before"], out["query_cpu_before"], out["runs_before"] = (
        run_queries()
    )
    t0 = time.time()
    compact_meta = compact_index(spark, path, target_files=8)
    out["compact_wall"] = round(time.time() - t0, 3)
    out["files_after"] = n_files()
    out["query_wall_after"], out["query_cpu_after"], out["runs_after"] = (
        run_queries()
    )
    out["compact_stats"] = compact_meta
    out["load_end"] = loadavg_1m()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
