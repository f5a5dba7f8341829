"""Interleaved A/B: the bm25/tfidf tokenize-explode stage vs a one-pass
Arrow tokenizer (r19, VERDICT r18 task 7).

The r18 query-vocabulary pushdown A/B killed the filter idea; the
remaining lever is the tokenizer itself.  A = the in-tree shape
(split + explode + codegen partial agg -> (doc, term, tf), then the
vocabulary df aggregate).  B = mapInPandas computing
collections.Counter(text.split(' ')) per doc and emitting
(_id, dl, w, tf) directly — same rows by construction (integer counts),
the explode and the first shuffle's map side replaced by Python.

Forces dfreq (downstream of tf, so the whole tokenize+aggregate chain
runs) with the noop sink, min-of-3, interleaved; tf-level parity
checked at the end.  Usage: python tools/probe_ab_tokenize_r19.py
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
from tikv_data_compare_spark.session import get_spark, scale_out

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.localdata/sf1")
spark = get_spark("ab-tokenize-r19")
meter = bench_mod.ProcTreeCpuMeter()
docs = q._load(spark, sf_dir, "documents").select("doc_id", "text")
docs.count()


def timed(name, thunk, n=3):
    best = cpu = None
    for _ in range(n):
        spark.catalog.clearCache()
        p0 = meter.sample()
        t0 = time.time()
        thunk().write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        c = meter.sample() - p0
        if best is None or dt < best:
            best, cpu = dt, c
    print(json.dumps({"probe": name, "wall": round(best, 3), "cpu": round(cpu, 2)}))
    sys.stdout.flush()


def tf_split():
    d = scale_out(docs, key="doc_id")
    toks = d.where(F.col("text").isNotNull()).select(
        F.col("doc_id").alias("_id"),
        F.split(F.col("text"), " ").alias("_ws"),
    ).withColumn("dl", F.expr("CAST(size(_ws) AS BIGINT)"))
    words = toks.select("_id", "dl", F.explode("_ws").alias("w"))
    return words.groupBy("_id", "dl", "w").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )


def tf_arrow():
    from collections import Counter

    def tok(batches):
        import pandas as pd

        for pdf in batches:
            ids, dls, ws, tfs = [], [], [], []
            for i, t in zip(pdf["doc_id"], pdf["text"]):
                if t is None:
                    continue
                parts = t.split(" ")
                dl = len(parts)
                for w_, c in Counter(parts).items():
                    ids.append(i)
                    dls.append(dl)
                    ws.append(w_)
                    tfs.append(c)
            yield pd.DataFrame(
                {"_id": pd.Series(ids, dtype="int64"),
                 "dl": pd.Series(dls, dtype="int64"),
                 "w": pd.Series(ws, dtype="object"),
                 "tf": pd.Series(tfs, dtype="int64")}
            )

    d = scale_out(docs, key="doc_id")
    return d.mapInPandas(tok, "_id long, dl long, w string, tf long")


def dfreq_of(tf):
    return tf.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("df"))


for rnd in range(3):
    timed(f"A_split_dfreq_{rnd}", lambda: dfreq_of(tf_split()))
    timed(f"B_arrow_dfreq_{rnd}", lambda: dfreq_of(tf_arrow()))
    timed(f"A_split_tf_{rnd}", tf_split)
    timed(f"B_arrow_tf_{rnd}", tf_arrow)

a = {tuple(r) for r in tf_split().collect()}
b = {tuple(r) for r in tf_arrow().collect()}
print(json.dumps({"tf_parity": a == b, "n": len(a)}))
