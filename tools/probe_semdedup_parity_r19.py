#!/usr/bin/env python
"""FULL-output parity sweep for the r19 semdedup numpy pair scorer.

Runs semantic_dedup over the ENTIRE embeddings fixture (not sampled) at
several geometries and writes every (vec_id, cluster, kept) row, sorted,
to a JSON file.  Run once from the pre-change worktree and once from the
changed tree; byte-identical files = bit parity (VERDICT r18 task 4's
acceptance bar).

    python tools/probe_semdedup_parity_r19.py /tmp/semdedup_{old|new}.json
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    out_path = sys.argv[1]
    from tikv_data_compare_spark.session import get_spark

    spark = get_spark("semdedup-parity", cpus=32)
    from tikv_data_compare_spark.operators import clustering as clu

    results = {}
    for sf in ("0.01", "0.1"):
        emb = spark.read.parquet(f"/root/testdata/sf{sf}/embeddings.parquet")
        for k, thr in ((16, 3000), ("auto", 3000), (16, 9500), (8, 9000), ("auto", 5000)):
            key = f"sf{sf}/k={k}/thr={thr}"
            rows = sorted(
                (int(r["vec_id"]), int(r["cluster"]), int(r["kept"]))
                for r in clu.semantic_dedup(
                    emb, k=k, n_iter=2, threshold_c=thr
                ).collect()
            )
            results[key] = rows
            print(f"[parity] {key}: {len(rows)} rows, "
                  f"{sum(1 for r in rows if not r[2])} dropped", file=sys.stderr)
    with open(out_path, "w") as f:
        json.dump(results, f, sort_keys=True)
    print(f"[parity] wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
