#!/usr/bin/env python
"""One-query cpu_sec A/B probe (VERDICT r8 tasks 1 & 7).

Runs q_curation_pipeline (min-of-5) and export_hex (min-of-3) with the
same warm-up + hygiene as bench.py, recording per-run wall and the
container cgroup cpu-second delta.  Works unmodified on the r7 and r8
tips (imports only symbols present in both).  Prints one JSON line.

Usage: python tools/probe_ab.py <label>
"""
from __future__ import annotations

import gc
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
    label = sys.argv[1] if len(sys.argv) > 1 else "tip"
    from pyspark.sql import functions as F

    from tikv_data_compare_spark import queries as q
    from tikv_data_compare_spark import queries_ext as qe
    from tikv_data_compare_spark.model import Keyed
    from tikv_data_compare_spark.operators.scan import export_hex
    from tikv_data_compare_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    spark = get_spark("probe_ab", cpus=cpus)

    orders = q._load(spark, sf_dir, "orders")
    ord_src = Keyed.of(orders, keys=("o_orderkey",))

    benches = {
        "curation_pipeline": lambda: qe.q_curation_pipeline(spark, sf_dir).count(),
        "export_hex": lambda: export_hex(ord_src).count(),
    }

    # warm-up: full heaviest plan once, untimed (same as bench.py r8)
    benches["curation_pipeline"]()

    out = {"label": label, "load_start": loadavg_1m(), "runs": {}, "cpu_runs": {}}
    for name, fn in benches.items():
        n_runs = 5 if name == "curation_pipeline" else 3
        walls, cpus_ = [], []
        for _ in range(n_runs):
            spark.catalog.clearCache()
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            c0 = container_cpu_sec()
            t0 = time.time()
            fn()
            walls.append(round(time.time() - t0, 3))
            cpus_.append(round(container_cpu_sec() - c0, 3))
        out["runs"][name] = walls
        out["cpu_runs"][name] = cpus_
        out[f"{name}_wall_min"] = min(walls)
        # cpu of the best-wall run (bench.py convention) AND the min cpu
        out[f"{name}_cpu_at_best_wall"] = cpus_[walls.index(min(walls))]
        out[f"{name}_cpu_min"] = min(cpus_)
    out["load_end"] = loadavg_1m()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
