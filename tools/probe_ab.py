#!/usr/bin/env python
"""One-query cpu_sec A/B probe (VERDICT r8 tasks 1 & 7; r9 task 7).

Runs the named bench entries (default: the r8 pair
curation_pipeline/export_hex) with the same warm-up + hygiene as
bench.py, recording per-run wall and the container cgroup cpu-second
delta.  Works unmodified on the r7..r10 tips (imports only symbols
present in all).  Prints one JSON line.

Usage: python tools/probe_ab.py <label> [op ...]
  ops: curation_pipeline export_hex tfidf funnel_gaps dedup_simhash
       dedup_lines topk_ivfpq topk_ivfpq_join bm25 semdedup dsir_sample
       bpe_tokens topk_pq_rerank dedup_minhash_pairs text_stats sessionize
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

    from tikv_data_compare_spark import queries_more as qm
    from tikv_data_compare_spark.operators import text as tx

    documents = q._load(spark, sf_dir, "documents")
    benches = {
        "curation_pipeline": lambda: qe.q_curation_pipeline(spark, sf_dir).count(),
        "export_hex": lambda: export_hex(ord_src).count(),
        # the two r9-verdict cpu-delta entries, bench.py-identical shapes
        "tfidf": lambda: tx.tfidf_top_terms(
            documents.select("doc_id", "text"), "doc_id", "text", k=3
        ).count(),
        "funnel_gaps": lambda: qm.q_events_funnel_gaps(spark, sf_dir).count(),
    }
    # r11-verdict task 7 entries (bench.py-identical shapes); guarded so the
    # script still runs on tips that predate them
    import inspect

    from tikv_data_compare_spark.operators import dedup as dd

    if "algo" in inspect.signature(dd.simhash).parameters:
        benches["dedup_simhash"] = lambda: dd.simhash(
            documents, "doc_id", "text", algo="xxhash64"
        ).count()
    else:  # pre-algo tips: the then-only hash path
        benches["dedup_simhash"] = lambda: dd.simhash(
            documents, "doc_id", "text"
        ).count()
    if hasattr(dd, "dedup_lines") and hasattr(qe, "LINE_SYNTH"):
        benches["dedup_lines"] = lambda: dd.dedup_lines(
            documents.select("doc_id", F.expr(qe.LINE_SYNTH).alias("t2")),
            "doc_id", "t2",
        ).count()
    # r13-verdict task 2 entries: the four r12 bench deltas (topk_ivfpq
    # breached its band; ivfpq_join/bm25/semdedup regressed with untouched
    # code) — bench.py-identical shapes, guarded for older tips
    from tikv_data_compare_spark.operators import similarity as sim

    embeddings = q._load(spark, sf_dir, "embeddings")
    benches["topk_ivfpq"] = lambda: sim.topk_ivfpq(
        embeddings, k=5, n_queries=10, n_cells=16, n_probe=4, m=8,
        k_codes=32, rerank=100,
    ).count()
    benches["topk_ivfpq_join"] = lambda: sim.topk_ivfpq_join(
        embeddings,
        embeddings.filter(F.col("vec_id") < 100).select(
            F.col("vec_id").alias("query_id"), "embedding"
        ),
        k=5, n_cells=16, n_probe=4, m=8, k_codes=32, rerank=100,
    ).count()
    if hasattr(tx, "bm25_topk"):
        benches["bm25"] = lambda: tx.bm25_topk(
            documents.select("doc_id", "text"),
            spark.createDataFrame(
                list(qm.BM25_QUERIES), "query_id long, qtext string"
            ),
            k=5,
        ).count()
    from tikv_data_compare_spark.operators import clustering as clu

    if hasattr(clu, "semantic_dedup"):
        benches["semdedup"] = lambda: clu.semantic_dedup(
            embeddings, k=16, n_iter=2, threshold_c=3000
        ).count()
    # r14 (VERDICT r13 task 6): the remaining r12+ bench entries, so every
    # open cpu question can be solo-A/B'd with the standard tool —
    # dsir_sample hit a KeyError here while the r13 judge tried to A/B its
    # in-suite 41→99 cpu-sec swing.  bench.py-identical shapes, guarded.
    from tikv_data_compare_spark.operators import sampling as sp

    if hasattr(sp, "dsir_sample"):
        # bench.py-identical shape: the r14+ bench entry runs the xxhash64
        # fast path; pre-r14 tips lack the algo param
        _dsir_kw = (
            {"algo": "xxhash64"}
            if "algo" in inspect.signature(sp.dsir_sample).parameters
            else {}
        )
        benches["dsir_sample"] = lambda: sp.dsir_sample(
            documents.select("doc_id", "text"),
            documents.filter(F.col("lang") == "en").select("doc_id", "text"),
            tau_c=0, n_buckets=4096, **_dsir_kw,
        ).count()
    if hasattr(tx, "bpe_token_count") and hasattr(tx, "train_bpe_merges"):
        benches["bpe_tokens"] = lambda: tx.bpe_token_count(
            documents.select("doc_id", "text"),
            tx.train_bpe_merges(documents.select("doc_id", "text")),
        ).count()
    if hasattr(sim, "topk_pq"):
        benches["topk_pq_rerank"] = lambda: sim.topk_pq(
            embeddings, k=5, n_queries=10, m=8, k_codes=32, rerank=100
        ).count()
    if hasattr(dd, "minhash_pairs"):
        benches["dedup_minhash_pairs"] = lambda: dd.minhash_pairs(
            documents, "doc_id", "text", algo="xxhash64"
        ).count()
    if hasattr(tx, "text_stats"):
        benches["text_stats"] = lambda: tx.text_stats(documents).count()
    benches["sessionize"] = lambda: q.q_events_sessionize(spark, sf_dir).count()

    ops = sys.argv[2:] or ["curation_pipeline", "export_hex"]
    benches = {k: benches[k] for k in ops}

    # warm-up: the heaviest selected plan once, untimed (same as bench.py r8)
    next(iter(benches.values()))()

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
