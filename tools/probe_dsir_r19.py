"""Decompose dsir_sample's bench-entry wall (r19, VERDICT r18 task 6).

The sf0.1 entry is 2.3 s with a 0.57 8-vs-32-core scaling ratio — serial
driver time dominates.  Split the bench-identical run into its serial
parts, min-of-3 each, cold cache per iteration (the bench ritual):

  weights_build  dsir_weights() construction — feature explode + persist
                 + the two overlapped bucket-count collect jobs + the
                 4096-row literal weight-table createDataFrame
  sample_build   dsir_sample(weights=w) plan construction — the 10k-row
                 coin createDataFrame + plan assembly (no job)
  force          the noop save of the resampling output (scoring from
                 the persisted (id,bucket,count) cache + joins)
  end_to_end     the bench entry verbatim (weights built inside)

plus micro-benchmarks of the two driver->JVM literal ships (tuple-list
createDataFrame vs Arrow via pandas) to see if the coin/weight-table
ship is worth converting.

Usage: python tools/probe_dsir_r19.py  (env: SPARK_GRAFT_SF_DIR,
default /root/testdata/sf0.1)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F

from tikv_data_compare_spark import queries as q
from tikv_data_compare_spark.operators import sampling as sp
from tikv_data_compare_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("probe-dsir-r19")
docs = q._load(spark, sf_dir, "documents").select("doc_id", "text")
target = q._load(spark, sf_dir, "documents").filter(
    F.col("lang") == "en"
).select("doc_id", "text")
docs.count(), target.count()  # scan warm-up outside every timing


def best_of(name, thunk, n=3, cold=True):
    best = None
    for _ in range(n):
        if cold:
            spark.catalog.clearCache()
        t0 = time.time()
        r = thunk()
        dt = time.time() - t0
        if best is None or dt < best:
            best = dt
    print(json.dumps({"probe": name, "wall": round(best, 3)}))
    sys.stdout.flush()
    return r


# end-to-end, bench verbatim
def e2e():
    sp.dsir_sample(
        docs, target, tau_c=0, n_buckets=4096, algo="xxhash64"
    ).write.format("noop").mode("overwrite").save()


best_of("end_to_end", e2e)

# decomposed: weights build (eager) / sample plan build / force
w_holder = {}


def weights_build():
    spark.catalog.clearCache()
    w = sp.dsir_weights(docs, target, n_buckets=4096, algo="xxhash64")
    w_holder["w"] = w
    return w


best_of("weights_build", lambda: weights_build(), cold=False)
w = w_holder["w"]
s_holder = {}
best_of(
    "sample_build",
    lambda: s_holder.update(
        s=sp.dsir_sample(docs, None, tau_c=0, n_buckets=4096,
                         algo="xxhash64", weights=w)
    ),
    cold=False,
)
best_of(
    "force",
    lambda: s_holder["s"].write.format("noop").mode("overwrite").save(),
    cold=False,
)

# micro: the two literal ships
import pandas as pd

coin_rows = sp._coin_rows()
best_of(
    "coins_cdf_tuples",
    lambda: spark.createDataFrame(coin_rows, "_u_bk long, _u_c long"),
    cold=False,
)
pdf = pd.DataFrame(coin_rows, columns=["_u_bk", "_u_c"])
best_of(
    "coins_cdf_arrow",
    lambda: spark.createDataFrame(pdf),
    cold=False,
)
