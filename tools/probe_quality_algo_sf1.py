#!/usr/bin/env python
"""A/B the curate() quality gate's feature hash at sf1 (r17, VERDICT r16
task 4): ``quality_algo='md5i64'`` (default, DuckDB-oracle checkable) vs
``'xxhash64'`` (the throughput path).

Unlike the span-decontam stages (whose verdicts are provably
algo-independent), the classifier's kept set IS feature-hash-dependent —
different bucket collisions train different weights — so the interesting
record is BOTH the cost asymmetry AND the kept-set delta:

- operator-level: ``sampling.quality_classifier(docs, seed, algo=X)``
  wall / proc-tree cpu (min-of-N) + the verdict disagreement count
  (docs where q_keep differs between the two hashes);
- funnel-level: ``curate(docs, quality_seed=seed, quality_algo=X)`` wall
  + kept-set symmetric difference.

Prints one JSON line; append it to tools/probe_quality_algo_sf1_runs.jsonl.

Usage: python tools/probe_quality_algo_sf1.py   (env: SPARK_GRAFT_SF_DIR)
"""
from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # proc_tree_cpu_sec — the sibling-proof cpu metric


def main():
    from pyspark.sql import functions as F

    from tikv_data_compare_spark.operators import curate as cur
    from tikv_data_compare_spark.operators import sampling as sp
    from tikv_data_compare_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.localdata/sf1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    n_runs = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "2"))
    spark = get_spark("probe_quality_algo_sf1", cpus=cpus)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    docs.limit(1).count()
    full = spark.read.parquet(f"{sf_dir}/documents.parquet")
    seed = full.filter(F.col("lang") == "en").select("text")

    out = {
        "probe": "quality_algo_ab_sf1", "sf_dir": sf_dir,
        "n_docs": docs.count(), "n_runs": n_runs,
        "operator": {}, "funnel": {}, "kept_delta": {},
    }

    def timed(fn):
        best_w, best_c = None, None
        for _ in range(n_runs):
            spark.catalog.clearCache()
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            p0 = bench.proc_tree_cpu_sec()
            t0 = time.time()
            fn()
            w = time.time() - t0
            if best_w is None or w < best_w:
                best_w = w
                best_c = bench.proc_tree_cpu_sec() - p0
        return round(best_w, 3), round(best_c, 3)

    # ---- operator-level A/B --------------------------------------------
    verdicts = {}
    for algo in ("md5i64", "xxhash64"):
        qc = sp.quality_classifier(docs, seed, n_buckets=2048, algo=algo)
        wall, cpu = timed(lambda q=qc: bench.run_forced(q))
        out["operator"][algo] = {"wall": wall, "cpu_proc": cpu}
        verdicts[algo] = {
            int(r["doc_id"]): bool(r["q_keep"]) if r["q_keep"] is not None else None
            for r in qc.select("doc_id", "q_keep").collect()
        }
    a, b = verdicts["md5i64"], verdicts["xxhash64"]
    disagree = sum(1 for k in a if a[k] != b.get(k))
    out["kept_delta"]["operator_disagree_docs"] = disagree
    out["kept_delta"]["operator_disagree_frac"] = round(disagree / max(len(a), 1), 5)
    out["kept_delta"]["keep_rate_md5i64"] = round(
        sum(1 for v in a.values() if v) / max(len(a), 1), 5
    )
    out["kept_delta"]["keep_rate_xxhash64"] = round(
        sum(1 for v in b.values() if v) / max(len(b), 1), 5
    )

    # ---- funnel-level A/B ----------------------------------------------
    kept_ids = {}
    for algo in ("md5i64", "xxhash64"):
        def run(algo=algo):
            kept, attr = cur.curate(
                full, quality_seed=seed, quality_algo=algo, algo="xxhash64"
            )
            attr.collect()
            kept_ids[algo] = {int(r["doc_id"]) for r in kept.select("doc_id").collect()}
            kept.unpersist()

        wall, cpu = timed(run)
        out["funnel"][algo] = {
            "wall": wall, "cpu_proc": cpu, "n_kept": len(kept_ids[algo]),
        }
    sym = kept_ids["md5i64"] ^ kept_ids["xxhash64"]
    out["kept_delta"]["funnel_sym_diff"] = len(sym)
    out["kept_delta"]["funnel_sym_diff_frac"] = round(
        len(sym) / max(len(kept_ids["md5i64"]), 1), 5
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
