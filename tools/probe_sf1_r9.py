#!/usr/bin/env python
"""sf0.1-vs-sf1 scaling datapoints for the r9/r10 operators that lacked them
(VERDICT r9 task 6): mixture_sample (sqrt variant), ngram_lm_score,
dedup-index batch ingest vs full re-dedup, and the r10 trained-BPE count.

Runs each op min-of-3 at the given sf dir and prints one JSON line.
Usage: python tools/probe_sf1_r9.py <label> <sf_dir>
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def loadavg_1m() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def main():
    label, sf_dir = sys.argv[1], sys.argv[2]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from tikv_data_compare_spark.operators import dedup as dd
    from tikv_data_compare_spark.operators import sampling as sp
    from tikv_data_compare_spark.operators import text as tx
    from tikv_data_compare_spark.session import get_spark
    from tikv_data_compare_spark.streaming.dedup_stream import (
        ingest_batch_into_dedup_index,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    spark = get_spark("probe_sf1_r9", cpus=cpus)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    n_docs = docs.count()  # warms the scan; untimed

    benches = {
        "mixture_sqrt": lambda: sp.sqrt_mixture_sample(docs).count(),
        "ngram_lm_score": lambda: tx.ngram_lm_score(docs).count(),
        "bpe_tokens": lambda: tx.bpe_token_count(
            docs, tx.train_bpe_merges(docs)
        ).count(),
    }
    out = {"label": label, "sf_dir": sf_dir, "n_docs": n_docs,
           "load_start": loadavg_1m(), "runs": {}}
    for name, fn in benches.items():
        fn()  # warm-up, untimed
        walls = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.time()
            fn()
            walls.append(round(time.time() - t0, 3))
        out["runs"][name] = walls
        out[f"{name}_wall_min"] = min(walls)

    # dedup-index amortization: ingest of a 10% batch against a prebuilt
    # 90% index vs a full-corpus re-dedup (the operation the index replaces)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    walls_ing, walls_full = [], []
    for i in range(3):
        tmp = tempfile.mkdtemp(prefix="probe_ddidx_")
        idx = os.path.join(tmp, "idx")
        ingest_batch_into_dedup_index(corpus, idx, epoch_id=0, algo="xxhash64")
        t0 = time.time()
        ingest_batch_into_dedup_index(batch, idx, epoch_id=1, algo="xxhash64")
        walls_ing.append(round(time.time() - t0, 3))
        t0 = time.time()
        dd.minhash_pairs(docs, "doc_id", "text", algo="xxhash64").count()
        walls_full.append(round(time.time() - t0, 3))
        shutil.rmtree(tmp, ignore_errors=True)
    out["runs"]["index_ingest_10pct"] = walls_ing
    out["runs"]["full_rededup"] = walls_full
    out["index_ingest_10pct_wall_min"] = min(walls_ing)
    out["full_rededup_wall_min"] = min(walls_full)
    out["load_end"] = loadavg_1m()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
