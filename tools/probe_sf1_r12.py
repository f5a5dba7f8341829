#!/usr/bin/env python
"""sf0.1-vs-sf1 scaling datapoints for the entries still lacking 10× factors
(VERDICT r11 tasks 4 & 5): dedup_lines, bm25, semdedup (bench geometries),
plus the NEW ANN-index streaming ingest (r12) — a 10% epoch append against a
prebuilt 90% index vs a full index rebuild, the amortization the streaming
face exists for.

Runs each op min-of-3 at the given sf dir and prints one JSON line.
Usage: python tools/probe_sf1_r12.py <label> <sf_dir>
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

    from tikv_data_compare_spark import queries_ext as qe
    from tikv_data_compare_spark import queries_more as qm
    from tikv_data_compare_spark.operators import ann_index as ai
    from tikv_data_compare_spark.operators import clustering as clu
    from tikv_data_compare_spark.operators import dedup as dd
    from tikv_data_compare_spark.operators import text as tx
    from tikv_data_compare_spark.session import get_spark
    from tikv_data_compare_spark.streaming.ann_index_stream import (
        ingest_batch_into_ann_index,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    spark = get_spark("probe_sf1_r12", cpus=cpus)
    documents = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embeddings = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_docs = documents.count()  # warms the scans; untimed
    n_vecs = embeddings.count()

    def _bm25_queries():
        return spark.createDataFrame(
            list(qm.BM25_QUERIES), "query_id long, qtext string"
        )

    benches = {
        # bench.py geometries, verbatim, so factors compare to BENCH_r*
        "dedup_lines": lambda: dd.dedup_lines(
            documents.select("doc_id", F.expr(qe.LINE_SYNTH).alias("t2")),
            "doc_id", "t2",
        ).count(),
        "bm25": lambda: tx.bm25_topk(
            documents.select("doc_id", "text"), _bm25_queries(), k=5
        ).count(),
        "semdedup": lambda: clu.semantic_dedup(
            embeddings, k=16, n_iter=2, threshold_c=3000
        ).count(),
    }
    out = {"label": label, "sf_dir": sf_dir, "n_docs": n_docs, "n_vecs": n_vecs,
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

    # ANN-index streaming ingest amortization: epoch append of a 10% batch
    # against a prebuilt 90% index (frozen codebooks, one map-side encode of
    # the batch) vs a full-corpus index rebuild (train + encode everything)
    corpus = embeddings.filter(F.col("vec_id") % 10 != 0)
    batch = embeddings.filter(F.col("vec_id") % 10 == 0)
    geo = {"n_cells": 16, "m": 8, "k_codes": 32}
    walls_ing, walls_build = [], []
    for _ in range(3):
        tmp = tempfile.mkdtemp(prefix="probe_annix_")
        idx = os.path.join(tmp, "idx")
        ingest_batch_into_ann_index(corpus, idx, epoch_id=0, build_opts=geo)
        t0 = time.time()
        ingest_batch_into_ann_index(batch, idx, epoch_id=1)
        walls_ing.append(round(time.time() - t0, 3))
        shutil.rmtree(tmp, ignore_errors=True)
        tmp2 = tempfile.mkdtemp(prefix="probe_annix_full_")
        t0 = time.time()
        ai.build_ann_index(embeddings, os.path.join(tmp2, "idx"), **geo)
        walls_build.append(round(time.time() - t0, 3))
        shutil.rmtree(tmp2, ignore_errors=True)
    out["runs"]["ann_stream_ingest_10pct"] = walls_ing
    out["runs"]["ann_full_rebuild"] = walls_build
    out["ann_stream_ingest_10pct_wall_min"] = min(walls_ing)
    out["ann_full_rebuild_wall_min"] = min(walls_build)
    out["load_end"] = loadavg_1m()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
