#!/usr/bin/env python
"""sf1 in-funnel trim measurement (r18, VERDICT r17 task 6).

r17 recorded the STANDALONE `self_dedup_trim` stress datapoint at sf1
(106.9 s xxhash64 / 233.5 s md5i64 at rekey50 on the 50k-doc fixture
where 49,061 docs genuinely share 24-char spans —
tools/probe_trim_sf1_runs.jsonl).  This probe answers the in-funnel
question the r16 drop-stage measurement answered for `self_dedup_span`:
what does `curate(self_dedup_trim_span=24, decontam_max_fp_df=50)` add
over the same funnel WITHOUT the trim, with the shared winnow frame
(`_fps_for`) amortizing the fingerprint pass?

Three timed configurations, one warm session, in order:
  base       — curate(docs) (default gates only)
  trim       — curate(docs, self_dedup_trim_span=24, decontam_max_fp_df=50)
               (the r18 gated-row geometry; algo = the r18 xxhash64
               span-stage fallback)
  standalone — self_dedup_trim(docs, min_span=24, max_fp_df=50) alone,
               forced through an output-length sum (the r17 stress shape,
               for in-session comparability)

The marginal wall (trim − base) is the in-funnel trim cost; standalone −
marginal is what funnel integration (shared winnow persist + one
kept-materialization job) saves.  cpu attribution uses bench.py's
ProcTreeCpuMeter (r18 once-counted semantics).

Usage: python tools/probe_trim_funnel_sf1.py   (env: SPARK_GRAFT_SF_DIR,
default .localdata/sf1).  Prints one JSON line per configuration plus a
summary line; append stdout to tools/probe_trim_funnel_sf1_runs.jsonl.
"""
from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (ProcTreeCpuMeter)
from pyspark.sql import functions as F  # noqa: E402


def _loadavg_1m() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])

from tikv_data_compare_spark.session import get_spark  # noqa: E402
from tikv_data_compare_spark.operators import text as tx  # noqa: E402
from tikv_data_compare_spark.operators.curate import curate  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", ".localdata/sf1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    spark = get_spark("probe_trim_funnel_sf1", cpus=cpus)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.limit(1).count()  # warm the session outside every timed window

    meter = bench.ProcTreeCpuMeter()

    def timed(tag: str, fn) -> dict:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        load0 = _loadavg_1m()
        c0 = meter.sample()
        t0 = time.time()
        extra = fn() or {}
        wall = round(time.time() - t0, 2)
        cpu = round(meter.sample() - c0, 1)
        rec = {
            "probe": "trim_funnel_sf1", "config": tag, "sf_dir": sf_dir,
            "wall_sec": wall, "cpu_proc_sec": cpu,
            "loadavg": [load0, _loadavg_1m()], **extra,
        }
        print(json.dumps(rec), flush=True)
        return rec

    def run_base():
        kept, att = curate(docs)
        n = kept.count()
        att.count()
        kept.unpersist()
        return {"kept": n}

    def run_trim():
        kept, att = curate(
            docs, self_dedup_trim_span=24, decontam_max_fp_df=50
        )
        n = kept.count()
        s = kept.agg(F.sum(F.length("text"))).collect()[0][0]
        att.count()
        kept.unpersist()
        return {"kept": n, "kept_chars": int(s)}

    def run_standalone():
        out = tx.self_dedup_trim(docs, min_span=24, max_fp_df=50)
        row = out.agg(
            F.sum(F.length("text_trimmed")).alias("s"),
            F.sum((~F.col("kept_intact")).cast("long")).alias("c"),
        ).collect()[0]
        return {"trimmed_chars_kept": int(row["s"]), "docs_cut": int(row["c"])}

    base = timed("curate_base", run_base)
    trim = timed("curate_trim24_cap50", run_trim)
    alone = timed("standalone_trim24_cap50", run_standalone)
    marginal = round(trim["wall_sec"] - base["wall_sec"], 2)
    print(json.dumps({
        "probe": "trim_funnel_sf1", "config": "summary",
        "marginal_trim_wall_sec": marginal,
        "marginal_trim_cpu_proc_sec": round(
            trim["cpu_proc_sec"] - base["cpu_proc_sec"], 1
        ),
        "standalone_wall_sec": alone["wall_sec"],
        "funnel_saving_vs_standalone_sec": round(
            alone["wall_sec"] - marginal, 2
        ),
        "r17_standalone_reference_sec": 106.9,
    }), flush=True)


if __name__ == "__main__":
    main()
