#!/usr/bin/env python
"""Per-part cost attribution for the `text_fingerprints` row (r15, VERDICT
r14 task 6): its Spark side was the slowest single row at sf1 (31.6 s
fresh-session, SURVEY §8 r14) and carries six gated parts — this probe
times each part separately at $SPARK_GRAFT_SF_DIR (default sf1), min-of-3
with cgroup cpu deltas, plus the fully-composed row, so a superlinear part
is visible instead of hiding inside the join tree.

Parts mirror queries_ext.q_text_fingerprints exactly:
  fingerprint      — per-doc XOR of distinct 3-shingle hashes
  winnow           — MOSS winnow (k=5, w=4) count+XOR per doc
  contamination    — 3-gram overlap vs the %20 probe slice
  decontam_exact   — winnow-prune + verbatim verify vs %17 span probes
  bloom            — 5040-bit bloom build (probe fps) + corpus probe
  self_dedup       — ExactSubstr self-join (span 24) + keep rule
  fuzzy            — MinHash band screen + exact-Jaccard verify vs %13
                     paraphrase probes
  composed_row     — the full q_text_fingerprints join tree

Prints one JSON line.  Usage: python tools/probe_fingerprints_parts.py
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
    from pyspark.sql import functions as F

    from tikv_data_compare_spark import queries_ext as qe
    from tikv_data_compare_spark.operators import bloom as bloom_ops
    from tikv_data_compare_spark.operators import text as tx
    from tikv_data_compare_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.localdata/sf1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    spark = get_spark("probe_fp_parts", cpus=cpus)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.limit(1).count()  # session warm-up

    wprobes = docs.filter(F.col("doc_id") % 17 == 0).selectExpr(
        "doc_id AS probe_id", "substr(text, 6, 45) AS text"
    )
    nn = docs.where(F.col("text").isNotNull())
    pnn = wprobes.where(F.col("text").isNotNull())
    fprobes = docs.selectExpr(
        "doc_id AS fz_probe_id",
        "CASE WHEN size(split(text, ' ')) > 2 THEN "
        "concat_ws(' ', slice(split(text, ' '), 3, size(split(text, ' ')) - 2)) "
        "ELSE text END AS text",
    ).where(F.col("fz_probe_id") % 13 == 0)

    def bloom_part():
        p_fp20 = tx.winnow_fingerprints(pnn, "probe_id", "text", k=5, w=20).where(
            F.col("fp").isNotNull()
        )
        bitmap = bloom_ops.bloom_build(
            p_fp20, "fp", m_bits=qe._BL_M, k_hashes=qe._BL_K
        )
        d_fp20 = tx.winnow_fingerprints(nn, "doc_id", "text", k=5, w=20).where(
            F.col("fp").isNotNull()
        )
        return (
            bloom_ops.bloom_probe(
                d_fp20, bitmap, "fp", qe._BL_M, qe._BL_K, id_cols=["doc_id", "fp"]
            )
            .groupBy("doc_id")
            .agg(F.sum("might_contain").cast("long").alias("bl_hits"))
            .count()
        )

    # Evaluation MUST consume the verdict columns: several parts end in a
    # per-id-aggregated LEFT join, which Catalyst legally ELIMINATES under
    # a bare count() (unique-key outer-join removal) — the r15 first cut
    # measured 0.4-0.5 s "walls" for decontam/self-dedup/fuzzy that were
    # really just the doc-id scan.  Aggregating the verdict columns forces
    # the real plan.
    parts = {
        "fingerprint": lambda: tx.fingerprint(docs)
        .agg(F.sum("fingerprint")).collect(),
        "winnow": lambda: tx.winnow_fingerprints(docs, "doc_id", "text", k=5, w=4)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_fp"), F.bit_xor("fp").alias("fp_xor"))
        .agg(F.sum("n_fp"), F.sum("fp_xor")).collect(),
        "contamination": lambda: tx.contamination(
            docs, docs.filter(F.col("doc_id") % 20 == 0),
            probe_id_col="doc_id", n=3,
        ).agg(F.sum("n_hit_grams"), F.sum("n_grams")).collect(),
        "decontam_exact": lambda: tx.decontaminate_substring(
            docs, wprobes, min_span=24
        ).agg(
            F.sum("n_contam_probes"), F.sum(F.col("contaminated").cast("long"))
        ).collect(),
        # r16: the rekey split at threshold 50 — byte-identical verdicts to
        # decontam_exact (equivalence-tested), with the hot fingerprints
        # routed through the broadcast gram join instead of the winnow
        # candidate join (the 76 s / 2157 cpu-s uncapped row's replacement)
        "decontam_rekey50": lambda: tx.decontaminate_substring(
            docs, wprobes, min_span=24, max_fp_df=50
        ).agg(
            F.sum("n_contam_probes"), F.sum(F.col("contaminated").cast("long"))
        ).collect(),
        "bloom": bloom_part,
        # the analytic candidate count of the UNCAPPED self-join: one cheap
        # df histogram, sum df·(df−1)/2 — the uncapped run itself was
        # killed after 15+ min at sf1 (hot common-phrase fingerprints make
        # the candidate set quadratic in their document frequency)
        "self_dedup_uncapped_candidates": lambda: tx.winnow_fingerprints(
            docs, "doc_id", "text", k=5, w=20
        )
        .where(F.col("fp").isNotNull())
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_df"))
        .agg(F.sum(F.expr("_df * (_df - 1) / 2")).alias("cand")).collect(),
        # the r15 measured operating point: the max_fp_df hot-fingerprint
        # DROP cap — pinned to hot_fp_mode='drop' so the series stays
        # comparable with the r15 numbers now that the operator default is
        # the exact rekey mode (measured separately below)
        "self_dedup_capped50": lambda: tx.self_dedup_substring(
            docs, min_span=24, max_fp_df=50, hot_fp_mode="drop"
        ).agg(
            F.sum("n_dup_partners"), F.sum("n_dup_chars"),
            F.sum(F.col("kept").cast("long")),
        ).collect(),
        # r16: the EXACT rekey mode at the same threshold — the honest
        # replacement for the killed uncapped run (byte-identical results,
        # bounded by the true duplicate-pair set instead of hot-fp df^2)
        "self_dedup_rekey50": lambda: tx.self_dedup_substring(
            docs, min_span=24, max_fp_df=50
        ).agg(
            F.sum("n_dup_partners"), F.sum("n_dup_chars"),
            F.sum(F.col("kept").cast("long")),
        ).collect(),
        "fuzzy": lambda: tx.decontaminate_fuzzy(
            docs, fprobes, probe_id_col="fz_probe_id", threshold_bp=8000
        ).agg(
            F.sum("n_fuzzy_probes"), F.sum(F.col("contaminated").cast("long"))
        ).collect(),
        # every column feeds one hash so NOTHING is prunable — the
        # driver's gate collects all columns, this is its cost model
        "composed_row": lambda: (
            lambda df: df.agg(
                F.sum(F.xxhash64(*[F.col(c) for c in df.columns]))
            ).collect()
        )(qe.q_text_fingerprints(spark, sf_dir)),
    }

    only = {
        p for p in os.environ.get("SPARK_GRAFT_PROBE_PARTS", "").split(",") if p
    }
    # r16: run-count knob for the heavy sf1 rekey entries (min-of-3 on a
    # multi-minute exact pass triples the probe for no attribution gain)
    n_runs = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "3"))
    out = {
        "probe": "fingerprints_parts", "sf_dir": sf_dir,
        "n_docs": docs.count(), "load_start": loadavg_1m(),
        "walls": {}, "cpu": {}, "runs": {},
    }
    for name, fn in parts.items():
        if only and name not in only:
            continue
        best, best_cpu, walls = None, -1.0, []
        for _ in range(n_runs):
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
        out["walls"][name] = round(best, 3)
        out["cpu"][name] = best_cpu
        out["runs"][name] = walls
        print(f"[probe] {name}: {walls} cpu={best_cpu}", file=sys.stderr)
    out["load_end"] = loadavg_1m()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
