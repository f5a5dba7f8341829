#!/usr/bin/env python
"""Compaction datapoints for the three non-ANN index artifacts (r15,
VERDICT r14 task 5): dedup bands, text postings, dhash bands.

r13 generalized the bounded clustered rewrite (`fsutil.compact_parquet_table`)
from the ANN index to all four persistent artifacts; only the ANN path was
measured (tools/probe_compaction.py, BASELINE.md r14).  This probe runs the
same protocol per index at $SPARK_GRAFT_SF_DIR (default sf1):

  build from a 1/4 base slice → append the rest in N small epochs (the
  fragment-accumulation shape a long-lived stream produces) → measure the
  SAME query batch before and after compact_*_index(target_files=8):
  fragment file count, query wall (min-of-3) + cgroup cpu delta of the
  best run, and the compaction rewrite cost itself.

Query batches:
  dedup  — 1-in-20 docs re-keyed to fresh ids (guaranteed band hits);
  text   — the fixed BM25 query set (queries_more.BM25_QUERIES);
  dhash  — 1-in-20 corpus hashes re-keyed (hamming-0 pairs); the hash
           source is xxhash64(text) — the index contracts on any
           (id, int64) frame, and compaction cost is hash-agnostic.

Prints one JSON line per index for BASELINE.md; raw runs included.
Usage: python tools/probe_compaction3.py [n_epochs]
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

    from pyspark.sql import functions as F

    from tikv_data_compare_spark import queries_more as qm
    from tikv_data_compare_spark.functions import fsutil
    from tikv_data_compare_spark.operators import dedup_index as di
    from tikv_data_compare_spark.operators import dhash_index as hi
    from tikv_data_compare_spark.operators import text_index as ti
    from tikv_data_compare_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.localdata/sf1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    spark = get_spark("probe_compaction3", cpus=cpus)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    id_max = docs.agg(F.max("doc_id").alias("m")).collect()[0]["m"]
    base_hi = id_max // 4
    n_docs = docs.count()

    def epoch_batches(df):
        per = max(1, (id_max - base_hi) // n_epochs)
        for i in range(n_epochs):
            lo = base_hi + i * per
            hi_ = id_max + 1 if i == n_epochs - 1 else lo + per
            yield df.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi_))

    def timed_queries(fn) -> tuple[float, float, list[float]]:
        best, best_cpu, walls = None, -1.0, []
        for _ in range(3):
            spark.catalog.clearCache()
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            c0 = container_cpu_sec()
            t0 = time.time()
            fn()
            dt = time.time() - t0
            walls.append(round(dt, 3))
            if best is None or dt < best:
                best, best_cpu = dt, round(container_cpu_sec() - c0, 3)
        return round(best, 3), best_cpu, walls

    def measure(name, frag_dir, build, appends, query, compact):
        path = fsutil.scratch_dir(prefix=f"probe_c3_{name}_") + "/index"
        build(path)
        for batch in appends(path):
            pass
        out = {
            "probe": f"compaction_{name}", "sf_dir": sf_dir, "n_docs": n_docs,
            "n_epochs": n_epochs, "load_start": loadavg_1m(),
        }
        files = lambda: len(glob.glob(f"{path}/{frag_dir}/*.parquet"))  # noqa: E731
        out["files_before"] = files()
        out["query_wall_before"], out["query_cpu_before"], out["runs_before"] = (
            timed_queries(lambda: query(path))
        )
        t0 = time.time()
        c0 = container_cpu_sec()
        stats = compact(path)
        out["compact_wall"] = round(time.time() - t0, 3)
        out["compact_cpu"] = round(container_cpu_sec() - c0, 3)
        out["files_after"] = files()
        out["query_wall_after"], out["query_cpu_after"], out["runs_after"] = (
            timed_queries(lambda: query(path))
        )
        out["compact_stats"] = {
            k: v for k, v in stats.items() if isinstance(v, (int, float, str))
        }
        out["load_end"] = loadavg_1m()
        print(json.dumps(out), flush=True)

    # ---------------- dedup band index
    probe_docs = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 1_000_000_000).alias("doc_id"), "text"
    )

    measure(
        "dedup_bands", "bands",
        build=lambda p: di.build_dedup_index(
            docs.filter(F.col("doc_id") < base_hi), p
        ),
        appends=lambda p: (
            di.append_to_dedup_index(b, p) for b in epoch_batches(docs)
        ),
        query=lambda p: di.query_dedup_index(probe_docs, p).count(),
        compact=lambda p: di.compact_dedup_index(spark, p, target_files=8),
    )

    # ---------------- text postings index
    queries = spark.createDataFrame(
        list(qm.BM25_QUERIES), "query_id long, qtext string"
    )

    measure(
        "text_postings", "postings",
        build=lambda p: ti.build_text_index(
            docs.filter(F.col("doc_id") < base_hi), p
        ),
        appends=lambda p: (
            ti.append_to_text_index(b, p) for b in epoch_batches(docs)
        ),
        query=lambda p: ti.query_text_index(queries, p, k=5).count(),
        compact=lambda p: ti.compact_text_index(spark, p, target_files=8),
    )

    # ---------------- dhash band index
    hashes = docs.select("doc_id", F.xxhash64("text").alias("dhash"))
    probe_hashes = hashes.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 1_000_000_000).alias("doc_id"), "dhash"
    )

    measure(
        "dhash_bands", "bands",
        build=lambda p: hi.build_dhash_index(
            hashes.filter(F.col("doc_id") < base_hi), p
        ),
        appends=lambda p: (
            hi.append_to_dhash_index(b, p)
            for b in epoch_batches(hashes)
        ),
        query=lambda p: hi.query_dhash_index(probe_hashes, p, max_hamming=6).count(),
        compact=lambda p: hi.compact_dhash_index(spark, p, target_files=8),
    )


if __name__ == "__main__":
    main()
