#!/usr/bin/env python
"""sf1 datapoints for the r12 scale seams (VERDICT r11 tasks 1 & 8):

1. BPE encode at a production-shaped merge table (1k ranks): the plan-
   literal SQL fold vs the broadcast Arrow priority-merge encoder over the
   same corpus — pins that the broadcast seam buys wall/compile time once
   the merge table stops being gate-sized.
2. k-means assignment at k=1024 over sf1 embeddings through the broadcast
   seam (the geometry the literal path cannot sanely compile) — one
   measured wall for BASELINE.md.

Runs min-of-3 walls and prints one JSON line per measurement.
Usage: python tools/probe_bpe_kmeans_sf1.py <label> <sf_dir>
"""
from __future__ import annotations

import json
import os
import sys
import time


def loadavg_1m() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def min_of(n, fn):
    best = None
    for _ in range(n):
        t0 = time.time()
        fn()
        w = time.time() - t0
        best = w if best is None or w < best else best
    return best


def main():
    label, sf_dir = sys.argv[1], sys.argv[2]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tikv_data_compare_spark.operators import clustering as cl
    from tikv_data_compare_spark.operators import text as tx
    from tikv_data_compare_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    spark = get_spark("probe_bpe_kmeans_sf1", cpus=cpus)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).cache()
    n_docs = docs.count()

    # -- train a 1k-rank merge table (driver loop is data-size independent:
    #    it runs over the vocab_top word-frequency table)
    t0 = time.time()
    merges = tx.train_bpe_merges(docs, n_merges=1000, vocab_top=4000)
    train_w = time.time() - t0

    out = {
        "label": label,
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "n_merges": len(merges),
        "bpe_train_wall_s": round(train_w, 2),
        "loadavg_start": loadavg_1m(),
    }

    def run_encode(mode):
        df = tx.bpe_encode(docs, merges, encode_mode=mode)
        # foreach-free full materialization: count total ids
        df.selectExpr("sum(size(token_ids)) AS n").collect()

    for mode in ("literal", "broadcast"):
        out[f"bpe_encode_{mode}_wall_s"] = round(
            min_of(3, lambda: run_encode(mode)), 2
        )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    out["n_vecs"] = emb.count()

    def run_kmeans():
        assign, _ = cl.kmeans(emb, k=1024, n_iter=1, assign_mode="broadcast")
        assign.groupBy().count().collect()

    out["kmeans_k1024_broadcast_wall_s"] = round(min_of(3, run_kmeans), 2)
    out["loadavg_end"] = loadavg_1m()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
