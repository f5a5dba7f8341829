#!/usr/bin/env python
"""sf1 curate() with every optional gate on (r15, VERDICT r14 task 8).

The last sf1 curation datapoint (6.9 s, r7/BENCH_sf1_r07) predates the
language / fluency / C4 / blocklist / DSIR / decontamination / redaction
stages.  curate() evaluates every gate inside ONE conditional-aggregation
job, so "per-stage walls" cannot be read off a single run — this probe
attributes by CUMULATIVE COMPOSITION instead: run curate() with gates
enabled one at a time in the documented stage order and report each
configuration's wall (min-of-2, cgroup cpu delta of the best run) plus
curate's own two-job split (LAST_STAGE_TIMINGS).  The marginal wall of
step k vs step k-1 is that gate's cost at sf1.

Gate parametrization (honest work, no mass-drop shortcuts):
  probes        — 45-char spans cut from the %20 corpus slice (the
                  text_fingerprints wprobes convention; full corpus docs
                  as probes are pathological — every probe is maximally
                  contaminated against its own source corpus, and the
                  verify stage degenerates toward all-pairs)
  decontam      — exact span 24 + fuzzy Jaccard 8000 on the same probes
  language      — keep every language present (full lang_id work, no drop)
  fluency       — corpus-trained bigram LM, generous cap
  dsir          — target = English docs, keep top 90% by weight
  c4/blocklist  — rules on; blocklist names an absent source (no drop)
  pii           — drop_pii off, redact_pii ON (the r15 release path)

Usage: python tools/probe_curate_sf1.py   (env: SPARK_GRAFT_SF_DIR)
Prints one JSON line.
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

    from tikv_data_compare_spark.operators import curate as cur
    from tikv_data_compare_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.localdata/sf1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    spark = get_spark("probe_curate_sf1", cpus=cpus)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.limit(1).count()
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    probes = docs.filter(F.col("doc_id") % 20 == 0).selectExpr(
        "doc_id AS probe_id", "substr(text, 6, 45) AS text"
    )
    target = docs.filter(F.col("lang") == "en").select("doc_id", "text")

    steps = [
        ("core4", {}),
        ("+redact_pii", {"redact_pii": True}),
        ("+decontam_exact", {"probes": probes, "decontam_span": 24}),
        # r16: the hot-fingerprint rekey split on the SAME stage (exact —
        # the marginal wall vs the step above is the rekey-vs-uncapped
        # delta inside the full funnel)
        ("+decontam_rekey50", {"decontam_max_fp_df": 50}),
        ("+decontam_fuzzy", {"decontam_fuzzy_jaccard_c": 8000}),
        # r16: corpus-internal ExactSubstr gate at the SAME span as the
        # decontam stage — exercises the shared one-winnow-pass seam
        ("+self_dedup_span24", {"self_dedup_span": 24}),
        ("+language", {"keep_langs": langs}),
        ("+fluency", {"max_lm_nll_c": 50_000_000}),
        ("+dsir", {"dsir_target": target, "dsir_top_frac": 0.9}),
        # r16: the model-based quality gate (seed = the English slice)
        ("+quality_clf", {"quality_seed": target.select("text")}),
        ("+c4_rules", {"c4_rules": True, "c4_min_kept_lines": 1}),
        ("+blocklist", {"blocked_sources": ["absent_source"]}),
    ]

    out = {
        "probe": "curate_sf1_all_gates", "sf_dir": sf_dir,
        "n_docs": docs.count(), "load_start": loadavg_1m(),
        "walls": {}, "cpu": {}, "runs": {}, "job_split": {}, "kept": {},
        "stages": {},
    }
    # untimed warm-up of the core plan: the first timed config otherwise
    # pays the whole-stage-codegen compile for the shared funnel subtree
    # and the cumulative design mis-reads warmth as stage cost (the
    # bench.py warm-up rationale)
    k0, a0 = cur.curate(docs, algo="xxhash64")
    a0.collect()
    k0.count()
    k0.unpersist()
    kwargs: dict = {"algo": "xxhash64"}
    n_runs = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "2"))
    # chunking knob (r16): the cumulative design means later configs each
    # cost minutes at sf1 — $SPARK_GRAFT_PROBE_ONLY (comma-separated
    # labels) APPLIES every step's delta in order but TIMES only the
    # listed ones, so the probe can run in harness-timeout-sized chunks
    only = {
        p for p in os.environ.get("SPARK_GRAFT_PROBE_ONLY", "").split(",") if p
    }
    for label, delta in steps:
        kwargs.update(delta)
        if only and label not in only:
            continue
        best, best_cpu, walls, split, n_kept, stages = None, -1.0, [], {}, 0, []
        for _ in range(n_runs):
            spark.catalog.clearCache()
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            c0 = container_cpu_sec()
            t0 = time.time()
            kept, attrition = cur.curate(docs, **kwargs)
            rows = attrition.collect()
            dt = time.time() - t0
            n_kept = kept.count()
            stages = [r["stage"] for r in rows]
            kept.unpersist()
            walls.append(round(dt, 3))
            if best is None or dt < best:
                best, best_cpu = dt, round(container_cpu_sec() - c0, 3)
                split = dict(cur.LAST_STAGE_TIMINGS)
        out["walls"][label] = round(best, 3)
        out["cpu"][label] = best_cpu
        out["runs"][label] = walls
        out["job_split"][label] = split
        out["kept"][label] = n_kept
        out["stages"][label] = stages
        print(f"[probe] {label}: {walls} cpu={best_cpu} kept={n_kept}",
              file=sys.stderr)
    out["load_end"] = loadavg_1m()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
