#!/usr/bin/env python
"""Decompose the r18-optimization targets into timed sub-plans (noop sink,
guide §1.4) so the optimization effort lands where the time actually goes.

Writes one JSON line per probe to stdout; run solo at low load.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def timed(spark, name, df, n=3):
    best = None
    import bench as bench_mod

    meter = bench_mod.ProcTreeCpuMeter()
    cpu_best = None
    for _ in range(n):
        spark.catalog.clearCache()
        p0 = meter.sample()
        t0 = time.time()
        df().write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        c = meter.sample() - p0
        if best is None or dt < best:
            best, cpu_best = dt, c
    print(json.dumps({"probe": name, "wall": round(best, 3), "cpu_proc": round(cpu_best, 2)}))
    sys.stdout.flush()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from tikv_data_compare_spark.session import get_spark
    from tikv_data_compare_spark import queries as q
    from tikv_data_compare_spark.operators import clustering as clu
    from tikv_data_compare_spark.operators import text as tx

    spark = get_spark("probe-decompose")
    docs = q._load(spark, sf_dir, "documents")
    emb = q._load(spark, sf_dir, "embeddings")
    only = set(
        x for x in os.environ.get("PROBE_ONLY", "").split(",") if x
    )

    def want(name):
        return not only or any(name.startswith(p) for p in only)

    # ---- warm the JVM on a representative heavy plan
    tx.winnow_fingerprints(docs, k=5, w=20, algo="xxhash64").write.format(
        "noop"
    ).mode("overwrite").save()

    # ---- trim decomposition (curation's dominant stage)
    if want("trim"):
        timed(spark, "trim.winnow_fps", lambda: tx.winnow_fingerprints(
            docs, k=5, w=20, algo="xxhash64"))
        fps = tx.winnow_fingerprints(docs, k=5, w=20, algo="xxhash64")

        def hot_agg():
            return (
                fps.where(F.col("fp").isNotNull())
                .groupBy("fp").agg(F.count(F.lit(1)).alias("_df"))
                .where(F.col("_df") > 200).select("fp")
            )

        timed(spark, "trim.hot_agg", hot_agg)
        timed(spark, "trim.span_grams_pos", lambda: tx._span_grams(
            docs, "doc_id", "text", 24, with_pos=True))
        timed(spark, "trim.hits", lambda: tx._self_dedup_hits(
            docs, "doc_id", "text", 24, 5, 200, "xxhash64", None, "rekey",
            collapse_earlier=True))
        timed(spark, "trim.full", lambda: tx.self_dedup_trim(
            docs, min_span=24, max_fp_df=200, algo="xxhash64"))

    # ---- curation full
    if want("curate"):
        from tikv_data_compare_spark import queries_ext as qe

        timed(spark, "curation.row", lambda: qe.q_curation_pipeline(spark, sf_dir), n=3)
        from tikv_data_compare_spark.operators.curate import curate

        def cur_no_trim():
            kept, _ = curate(docs)
            return kept

        timed(spark, "curation.no_trim_kept", cur_no_trim)

    # ---- semdedup decomposition
    if want("semdedup"):
        timed(spark, "semdedup.kmeans_assign_only", lambda: clu.kmeans(
            emb, k=16, n_iter=2)[0])
        timed(spark, "semdedup.full_k16", lambda: clu.semantic_dedup(
            emb, k=16, n_iter=2, threshold_c=3000))
        timed(spark, "semdedup.full_auto", lambda: clu.semantic_dedup(
            emb, k="auto", n_iter=2, threshold_c=3000))

    # ---- quality classifier
    if want("quality"):
        from tikv_data_compare_spark.operators import sampling as sp

        timed(spark, "quality.classifier", lambda: sp.quality_classifier(
            docs.select("doc_id", "text"),
            docs.filter(F.col("lang") == "en").select("text"),
            n_buckets=4096, algo="xxhash64"))
        timed(spark, "quality.feats_only", lambda: sp._dsir_feats(
            docs.select("doc_id", "text"), "doc_id", "text", 4096,
            algo="xxhash64"))

    # ---- bm25
    if want("bm25"):
        from tikv_data_compare_spark import queries_more as qm

        qdf = spark.createDataFrame(list(qm.BM25_QUERIES), "query_id long, qtext string")
        timed(spark, "bm25.topk", lambda: tx.bm25_topk(
            docs.select("doc_id", "text"), qdf, k=5))
        timed(spark, "bm25.corpus_tf_full", lambda: tx.bm25_corpus_stats(
            docs.select("doc_id", "text"))[0])


if __name__ == "__main__":
    main()
