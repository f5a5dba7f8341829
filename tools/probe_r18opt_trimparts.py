#!/usr/bin/env python
"""Isolate the trim hot path's pieces at sf0.1 (noop-forced, min-of-3):
warm-fps hits, the bare gram join, and the sv aggregation."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def timed(spark, meter, name, thunk, n=3):
    best = cpu_best = None
    for _ in range(n):
        p0 = meter.sample()
        t0 = time.time()
        thunk().write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        c = meter.sample() - p0
        if best is None or dt < best:
            best, cpu_best = dt, c
    print(json.dumps({"probe": name, "wall": round(best, 3), "cpu_proc": round(cpu_best, 2)}))
    sys.stdout.flush()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import bench as bench_mod
    from tikv_data_compare_spark.session import get_spark
    from tikv_data_compare_spark import queries as q
    from tikv_data_compare_spark.operators import text as tx

    spark = get_spark("probe-trimparts")
    meter = bench_mod.ProcTreeCpuMeter()
    docs = q._load(spark, sf_dir, "documents")

    fps = tx.winnow_fingerprints(docs, k=5, w=20, algo="xxhash64").persist()
    fps.count()

    # 1. hits with a WARM fps frame (what curate's seam provides)
    timed(spark, meter, "hits_warm_fps", lambda: tx._self_dedup_hits(
        docs, "doc_id", "text", 24, 5, 200, "xxhash64", fps, "rekey",
        collapse_earlier=True))

    # 2. the bare hot gram join (aff = every doc — true at this cap/corpus)
    aff = docs.select("doc_id").persist()
    aff.count()

    def gram_join():
        gp = tx._span_grams(docs, "doc_id", "text", 24, with_pos=True)
        gs = (
            tx._span_grams(docs, "doc_id", "text", 24)
            .groupBy("gram").agg(F.min("doc_id").alias("_ida"))
        )
        return (
            gp.select(F.col("doc_id").alias("_idb"), "_i", "gram")
            .join(gs, "gram")
            .where(F.col("_ida") < F.col("_idb"))
            .select("_idb", "_ida", "_i")
        )

    timed(spark, meter, "bare_gram_join", gram_join)

    # 3. gram join + sv aggregation + fold (the full trim tail)
    def trim_tail():
        hits = gram_join()
        return (
            hits.groupBy("_idb")
            .agg(F.sort_array(F.array_distinct(F.collect_list("_i"))).alias("_sv"))
        )

    timed(spark, meter, "gram_join_plus_sv", trim_tail)

    # 4. full trim with warm fps
    timed(spark, meter, "trim_full_warm_fps", lambda: tx.self_dedup_trim(
        docs, min_span=24, max_fp_df=200, algo="xxhash64", doc_fps=fps))


if __name__ == "__main__":
    main()
