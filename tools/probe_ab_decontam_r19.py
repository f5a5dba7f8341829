"""Interleaved A/B: decontaminate_substring full vs verdict_only (r19,
VERDICT r18 task 2) on a template-heavy contamination fixture at sf1.

Fixture = the r15 degeneracy geometry (BASELINE.md): probes are verbatim
cuts of the corpus itself (doc_id % 17 -> ~2.9k probes at sf1), so the
template spans shared across the corpus are shared across the PROBES too
and the hot-fingerprint gram join fans out positions x probes-sharing-a-
gram.  A = the full operator (per-probe hot pairs, the pre-r19 curate
call), B = verdict_only=True (collapsed one-row-per-distinct-gram probe
side, xxhash64 key + in-flight string re-verify).  Both run the curate
geometry: shared persisted doc_fps, max_fp_df=200, algo=xxhash64.

Interleaved A,B per round; noop sink; parity checked on the verdict
column at the end.  Usage: python tools/probe_ab_decontam_r19.py
(env: SPARK_GRAFT_SF_DIR, default /root/repo/.localdata/sf1)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench as bench_mod
from pyspark.sql import functions as F

from tikv_data_compare_spark import queries as q
from tikv_data_compare_spark.operators import text as tx
from tikv_data_compare_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.localdata/sf1")
spark = get_spark("ab-decontam-r19")
meter = bench_mod.ProcTreeCpuMeter()

docs = q._load(spark, sf_dir, "documents").select("doc_id", "text")
probes = docs.filter(F.col("doc_id") % 17 == 0).selectExpr(
    "doc_id AS probe_id", "substr(text, 6, 60) AS text"
)
fps = tx.winnow_fingerprints(docs, k=5, w=20, algo="xxhash64").persist()
fps.count()
CAP = 200  # the q_curation_pipeline threshold (probe_trim_cap_r18)


def timed(name, thunk, n=3):
    best = cpu = None
    for _ in range(n):
        p0 = meter.sample()
        t0 = time.time()
        thunk().write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        c = meter.sample() - p0
        if best is None or dt < best:
            best, cpu = dt, c
    print(json.dumps({"probe": name, "wall": round(best, 3), "cpu": round(cpu, 2)}))
    sys.stdout.flush()


def full():
    return tx.decontaminate_substring(
        docs, probes, min_span=24, algo="xxhash64", max_fp_df=CAP, doc_fps=fps
    )


def verdict():
    return tx.decontaminate_substring(
        docs, probes, min_span=24, algo="xxhash64", max_fp_df=CAP, doc_fps=fps,
        verdict_only=True,
    )


for rnd in range(3):
    timed(f"A_full_{rnd}", full)
    timed(f"B_verdict_{rnd}", verdict)

a = {(r["doc_id"], r["contaminated"]) for r in full().select("doc_id", "contaminated").collect()}
b = {tuple(r) for r in verdict().collect()}
print(json.dumps({"parity": a == b, "n_docs": len(b),
                  "n_contaminated": sum(1 for _, c in b if c)}))
