#!/usr/bin/env python
"""sf0.1-vs-sf1 scaling datapoints for the four r12 operators still lacking
10x factors: corpus-internal exact-substring self-dedup, DSIR importance
resampling, greedy token-budget fill, and the persistent dHash band index
(build + 10% batch query).

Geometries mirror the gate/bench shapes; the token budget scales with the
corpus (30% of whitespace tokens) so the admitted fraction — and thus the
work — is comparable across sf.  dHash inputs are synthetic int64 hashes
(xxhash64 of the text): the scaling question is the band explode + equi-join
+ verify, not image decode.

Runs each op min-of-3 at the given sf dir and prints one JSON line.
Usage: python tools/probe_sf1_r12b.py <label> <sf_dir>
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

    from tikv_data_compare_spark.operators import dhash_index as dhi
    from tikv_data_compare_spark.operators import sampling as sp
    from tikv_data_compare_spark.operators import text as tx
    from tikv_data_compare_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    spark = get_spark("probe_sf1_r12b", cpus=cpus)
    documents = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = documents.select("doc_id", "text")
    n_docs = documents.count()  # warms the scan; untimed
    # corpus-proportional budget: ~30% of whitespace tokens admitted
    total_tok = docs.select(
        F.sum(F.size(F.split(F.coalesce("text", F.lit("")), " ")))
    ).first()[0]
    budget = int(total_tok * 0.3)

    benches = {
        "self_dedup": lambda: tx.self_dedup_substring(docs, min_span=24).count(),
        "dsir_sample": lambda: sp.dsir_sample(
            docs,
            documents.filter(F.col("lang") == "en").select("doc_id", "text"),
            tau_c=0, n_buckets=4096,
        ).count(),
        "token_budget": lambda: sp.token_budget_sample(docs, budget).count(),
    }
    out = {"label": label, "sf_dir": sf_dir, "n_docs": n_docs,
           "budget_tokens": budget, "load_start": loadavg_1m(), "runs": {}}
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

    # dHash band index: build over the full corpus's (synthetic) hashes,
    # then query a 10% new batch against it — the incremental-ingest shape
    hashes = docs.select(
        "doc_id", F.xxhash64(F.coalesce("text", F.lit(""))).alias("dhash")
    )
    corpus_h = hashes.filter(F.col("doc_id") % 10 != 0)
    batch_h = hashes.filter(F.col("doc_id") % 10 == 0)
    walls_build, walls_query = [], []
    for _ in range(3):
        tmp = tempfile.mkdtemp(prefix="probe_dhix_")
        idx = os.path.join(tmp, "idx")
        t0 = time.time()
        dhi.build_dhash_index(corpus_h, idx, n_bands=8)
        walls_build.append(round(time.time() - t0, 3))
        t0 = time.time()
        dhi.query_dhash_index(batch_h, idx, max_hamming=6).count()
        walls_query.append(round(time.time() - t0, 3))
        shutil.rmtree(tmp, ignore_errors=True)
    out["runs"]["dhash_index_build"] = walls_build
    out["runs"]["dhash_index_query_10pct"] = walls_query
    out["dhash_index_build_wall_min"] = min(walls_build)
    out["dhash_index_query_10pct_wall_min"] = min(walls_query)
    out["load_end"] = loadavg_1m()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
