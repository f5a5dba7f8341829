#!/usr/bin/env python
"""sf0.1-vs-sf1 scaling for the Bloom membership gate (r12): build a filter
from the corpus's span-24 winnow fingerprints and probe the whole corpus's
fingerprints against it — the decontamination screening shape.  The bitmap
is fixed-size (63*4096 words here), so build cost tracks the insert volume
once and probe cost tracks the probed volume; nothing scales with the
REFERENCE set size, which is the design claim.

Usage: python tools/probe_sf1_bloom.py <label> <sf_dir>
"""
from __future__ import annotations

import json
import os
import sys
import time


def loadavg_1m() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def main():
    label, sf_dir = sys.argv[1], sys.argv[2]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from tikv_data_compare_spark.operators import bloom as bl
    from tikv_data_compare_spark.operators import text as tx
    from tikv_data_compare_spark.operators.dedup import subtract_corpus
    from tikv_data_compare_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    spark = get_spark("probe_sf1_bloom", cpus=cpus)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).where(F.col("text").isNotNull())
    n_docs = docs.count()
    m, k = 63 * 4096, 4
    probes = docs.filter(F.col("doc_id") % 17 == 0).selectExpr(
        "doc_id AS probe_id", "substr(text, 6, 45) AS text"
    )
    p_fp = tx.winnow_fingerprints(probes, "probe_id", "text", k=5, w=20).where(
        F.col("fp").isNotNull()
    )
    d_fp = tx.winnow_fingerprints(docs, "doc_id", "text", k=5, w=20).where(
        F.col("fp").isNotNull()
    )
    n_fps = d_fp.count()  # warms both winnow paths; untimed

    out = {"label": label, "sf_dir": sf_dir, "n_docs": n_docs,
           "n_doc_fps": n_fps, "m_bits": m, "k_hashes": k,
           "load_start": loadavg_1m(), "runs": {}}
    for name, fn in {
        "bloom_build": lambda: bl.bloom_build(p_fp, "fp", m, k).count(),
        "bloom_probe_corpus": lambda: bl.bloom_probe(
            d_fp, bl.bloom_build(p_fp, "fp", m, k), "fp", m, k,
            id_cols=["doc_id", "fp"],
        ).agg(F.sum("might_contain")).first()[0],
        "subtract_corpus_bloom": lambda: subtract_corpus(
            docs, docs.filter(F.col("doc_id") % 7 == 0).select(
                (F.col("doc_id") + 10**7).alias("doc_id"), "text"),
            bloom_m_bits=m,
        ).agg(F.sum("in_other")).first()[0],
    }.items():
        fn()  # warm-up, untimed
        walls = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.time()
            fn()
            walls.append(round(time.time() - t0, 3))
        out["runs"][name] = walls
        out[f"{name}_wall_min"] = min(walls)
    out["load_end"] = loadavg_1m()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
