"""Similarity search over embedding columns.

Baseline: brute-force cosine top-k (broadcast the query set, JVM-side
``zip_with``/``aggregate`` dot products — no Python in the loop).  Scale
path: random-hyperplane LSH bucketing so each vector only scores against its
bucket.  Exact-dup detection via canonical vector fingerprints.

Cross-engine determinism: scores are ranked on the ROUNDED (×10000) cosine
with neighbor-id tie-break, and both engines accumulate the dot product in
index order over doubles, so rankings match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from tikv_data_compare_spark.functions import sqlgen

DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)


def _dot(a: str, b: str) -> str:
    return DOT.format(a=a, b=b)


def topk_bruteforce(emb: DataFrame, k: int = 5, n_queries: int = 10) -> DataFrame:
    """Exact cosine top-k: queries (vec_id < n_queries) × all vectors.

    The query side is broadcast (BroadcastNestedLoopJoin over the != filter);
    candidates never shuffle.  At 100 TB the corpus side stays partitioned
    and each partition scores independently — embarrassingly parallel.
    """
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    joined = emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.expr(
            "CAST(ROUND(10000.0 * "
            + _dot("q_emb", "embedding")
            + " / (sqrt("
            + _dot("q_emb", "q_emb")
            + ") * sqrt("
            + _dot("embedding", "embedding")
            + "))) AS BIGINT)"
        ).alias("cosine_c"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_c"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine_c", "rnk")
    )


def lsh_buckets(emb: DataFrame, n_planes: int = 8, seed: int = 7) -> DataFrame:
    """Random-hyperplane LSH bucket per vector (sign bits of projections).

    Planes are deterministic pseudo-random unit-ish vectors derived from
    xxhash64(seed, plane, dim) — no driver-side randomness, reproducible
    across runs and resumable at any scale.
    """
    dim = len(emb.select("embedding").first()["embedding"])
    # plane p component d in [-0.5, 0.5): hash-based, computed JVM-side
    bits = []
    for p in range(n_planes):
        terms = " + ".join(
            f"CAST(embedding[{d}] AS DOUBLE) * "
            f"((CAST(xxhash64({seed}, {p}, {d}) % 1000 AS DOUBLE)) / 1000.0)"
            for d in range(dim)
        )
        bits.append(f"(CASE WHEN ({terms}) >= 0 THEN CAST({1 << p} AS BIGINT) ELSE 0 END)")
    return emb.withColumn("bucket", F.expr(" + ".join(bits)).cast("long"))


def topk_lsh(emb: DataFrame, k: int = 5, n_queries: int = 10, n_planes: int = 6) -> DataFrame:
    """Approximate top-k: score only within the query's LSH bucket.

    Scale shape: equi-join on bucket (one shuffle) instead of a full cross
    product — the IVF-style path for 100 TB corpora.  Recall is tunable via
    n_planes (fewer planes → bigger buckets → higher recall).
    """
    b = lsh_buckets(emb, n_planes)
    q = b.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"), "bucket"
    )
    joined = b.join(F.broadcast(q), on="bucket").filter(F.col("vec_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.expr(
            "CAST(ROUND(10000.0 * "
            + _dot("q_emb", "embedding")
            + " / (sqrt("
            + _dot("q_emb", "q_emb")
            + ") * sqrt("
            + _dot("embedding", "embedding")
            + "))) AS BIGINT)"
        ).alias("cosine_c"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_c"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine_c", "rnk")
    )


def embedding_exact_dup(emb: DataFrame) -> DataFrame:
    """Exact-duplicate embeddings via canonical fingerprint.

    Elements are scaled to integers (ROUND half-away in both engines) before
    hashing — raw float formatting is not engine-stable.
    """
    canon = (
        "array_join(transform(embedding, "
        "x -> CAST(CAST(ROUND(CAST(x AS DOUBLE) * 100000) AS BIGINT) AS STRING)), ',')"
    )
    hashed = emb.withColumn("_m", F.md5(F.expr(canon))).withColumn(
        "vec_fp", F.expr(sqlgen.hexfold_i64("_m")).cast("long")
    )
    return hashed.groupBy("vec_fp").agg(
        F.min("vec_id").cast("long").alias("keep_vec_id"),
        F.count(F.lit(1)).cast("long").alias("n_dups"),
    )
