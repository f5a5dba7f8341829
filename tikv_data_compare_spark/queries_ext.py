"""Extension queries: dedup, similarity search, text analysis, multimodal.

These are the LLM-training-data-pipeline operators beyond the reference's
surface (SURVEY.md §2.7/§7.4), built on the same cross-engine canon/hash
primitives so almost all of them are DuckDB-oracle checkable.  The Spark
implementations live in tikv_data_compare_spark/operators/{dedup,similarity,
text}.py; this module wires them to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from tikv_data_compare_spark.functions import sqlgen
from tikv_data_compare_spark.functions.sqlgen import DUCK, SPARK
from tikv_data_compare_spark.operators import dedup as dd
from tikv_data_compare_spark.operators import similarity as sim
from tikv_data_compare_spark.operators import text as tx
from tikv_data_compare_spark.queries import MINHASH_P, MINHASH_PERMS, STOPWORDS, _dc, _load
from tikv_data_compare_spark.session import tune

# ========================================================== dedup: exact


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group documents by content fingerprint; keep canonical
    representative (min doc_id) + duplicate count."""
    tune(spark)
    return dd.exact_groups(_load(spark, sf_dir, "documents"), "doc_id", "text")


ORACLE_DEDUP_EXACT = f"""
SELECT CAST({sqlgen.hexfold_i64('_m')} AS BIGINT) AS content_id,
       CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
       CAST(count(*) AS BIGINT) AS n_dups
FROM (SELECT doc_id, md5(text) AS _m FROM documents)
GROUP BY 1
"""


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup — the training-data ingestion shape: documents
    arrive over micro-batches, Spark's built-in ``dropDuplicates`` state
    suppresses content already seen in ANY earlier batch.  Replayed as two
    chunks where chunk 2 is an exact copy of the corpus under shifted ids:
    every chunk-2 row must be deduped *against chunk-1 state*, so the
    surviving content-id set equals the batch DISTINCT (the oracle).  Only
    the content-id set is projected — which physical row survives a dup
    group is not deterministic, the set is."""
    import glob
    import os
    import shutil
    import tempfile
    import time

    tune(spark)
    docs = _load(spark, sf_dir, "documents").select("doc_id", "text")
    shifted = docs.withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000))

    d = tempfile.mkdtemp(prefix="tdc_stream_dedup_")
    scratch = tempfile.mkdtemp(prefix="tdc_stream_dedup_w_")
    t0 = time.time() - 3600
    for i, chunk in enumerate((docs, shifted)):
        cdir = os.path.join(scratch, f"c{i}")
        chunk.coalesce(1).write.mode("overwrite").parquet(cdir)
        part = glob.glob(os.path.join(cdir, "part-*.parquet"))[0]
        dst = os.path.join(d, f"chunk_{i}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (t0 + 60 * i, t0 + 60 * i))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    hashed = stream.withColumn("_m", F.md5("text")).withColumn(
        "content_id", F.expr(sqlgen.hexfold_i64("_m")).cast("long")
    )
    deduped = hashed.dropDuplicates(["content_id"])
    sink = tempfile.mkdtemp(prefix="tdc_stream_dedup_out_")

    def on_batch(b: DataFrame, epoch_id: int) -> None:
        b.select("content_id").write.mode("overwrite").parquet(
            os.path.join(sink, f"epoch_{epoch_id}")
        )

    q = (
        deduped.writeStream.foreachBatch(on_batch)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    epochs = [os.path.join(sink, p) for p in sorted(os.listdir(sink)) if p.startswith("epoch_")]
    if not epochs:
        return spark.createDataFrame([], "content_id long")
    # distinct defends only against epoch *retries* (idempotence); the state
    # store already guarantees cross-batch uniqueness
    return spark.read.schema("content_id long").parquet(*epochs).distinct()


ORACLE_STREAM_DEDUP = f"""
SELECT DISTINCT CAST({sqlgen.hexfold_i64('_m')} AS BIGINT) AS content_id
FROM (SELECT md5(text) AS _m FROM documents)
"""


# ========================================================== dedup: minhash


def q_dedup_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (8 perms over the distinct 3-shingle set)."""
    tune(spark)
    return dd.minhash_signatures(_load(spark, sf_dir, "documents"), "doc_id", "text")


DUCK_SHINGLES = f"""
  SELECT DISTINCT doc_id, w FROM (
    SELECT doc_id, unnest(CASE WHEN len(ws) >= 3
        THEN list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
        ELSE [text] END) AS w
    FROM (SELECT doc_id, text, {sqlgen.split_words('text', DUCK)} AS ws FROM documents)
  )
"""


def _oracle_minhash_sig_cte() -> str:
    mins = ", ".join(
        f"CAST(min((CAST({a} AS BIGINT) * _h1 + {b}) % {MINHASH_P}) AS BIGINT) AS m{i}"
        for i, (a, b) in enumerate(MINHASH_PERMS)
    )
    return f"""
  SELECT doc_id, {mins}
  FROM (
    SELECT doc_id, ({sqlgen.hexfold_i64('_m')}) & 1073741823 AS _h1
    FROM (SELECT doc_id, md5(w) AS _m FROM ({DUCK_SHINGLES}))
  )
  GROUP BY doc_id
"""


ORACLE_DEDUP_MINHASH_SIG = f"SELECT * FROM (\n{_oracle_minhash_sig_cte()}\n)"


def q_dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs: docs sharing ≥1 of 4 two-perm LSH bands.
    Spark path is the scalable band-explode equi-join (shuffle on band hash,
    no cartesian); the oracle states the same set declaratively."""
    tune(spark)
    return dd.minhash_pairs(_load(spark, sf_dir, "documents"), "doc_id", "text")


ORACLE_DEDUP_MINHASH_PAIRS = f"""
WITH sig AS ({_oracle_minhash_sig_cte()})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND (
     (a.m0 = b.m0 AND a.m1 = b.m1) OR (a.m2 = b.m2 AND a.m3 = b.m3)
  OR (a.m4 = b.m4 AND a.m5 = b.m5) OR (a.m6 = b.m6 AND a.m7 = b.m7))
"""


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clusters: connected components over the minhash
    LSH candidate-pair graph (operators/graph.py min-label propagation,
    localCheckpoint-ed per round).  A dup CLUSTER is the transitive closure
    of pairwise candidates — keep min doc_id per component; the oracle
    reproduces the closure with a recursive CTE."""
    tune(spark)
    from tikv_data_compare_spark.operators.graph import connected_components

    pairs = dd.minhash_pairs(_load(spark, sf_dir, "documents"), "doc_id", "text")
    comp = connected_components(pairs)
    return comp.select(F.col("id").alias("doc_id"), "component")


ORACLE_DEDUP_COMPONENTS = f"""
WITH RECURSIVE sig AS ({_oracle_minhash_sig_cte()}),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND (
       (a.m0 = b.m0 AND a.m1 = b.m1) OR (a.m2 = b.m2 AND a.m3 = b.m3)
    OR (a.m4 = b.m4 AND a.m5 = b.m5) OR (a.m6 = b.m6 AND a.m7 = b.m7))
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b AS u, doc_a AS v FROM pairs
),
reach(u, r) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.u
)
SELECT CAST(u AS BIGINT) AS doc_id, CAST(min(r) AS BIGINT) AS component
FROM reach GROUP BY u
"""


def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-set Jaccard for the minhash candidate pairs (verify stage
    of the near-dup pipeline)."""
    tune(spark)
    return dd.jaccard_pairs(_load(spark, sf_dir, "documents"), "doc_id", "text")


ORACLE_DEDUP_JACCARD = f"""
WITH sig AS ({_oracle_minhash_sig_cte()}),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND (
       (a.m0 = b.m0 AND a.m1 = b.m1) OR (a.m2 = b.m2 AND a.m3 = b.m3)
    OR (a.m4 = b.m4 AND a.m5 = b.m5) OR (a.m6 = b.m6 AND a.m7 = b.m7))
),
words AS ({DUCK_SHINGLES}),
sizes AS (SELECT doc_id, count(*) AS n FROM words GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS ninter
  FROM cand c JOIN words wa ON wa.doc_id = c.doc_a JOIN words wb ON wb.doc_id = c.doc_b AND wa.w = wb.w
  GROUP BY c.doc_a, c.doc_b
)
SELECT c.doc_a, c.doc_b,
       CAST(ROUND(10000.0 * coalesce(i.ninter, 0) / (sa.n + sb.n - coalesce(i.ninter, 0))) AS BIGINT) AS jaccard_c
FROM cand c
JOIN sizes sa ON sa.doc_id = c.doc_a JOIN sizes sb ON sb.doc_id = c.doc_b
LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
"""


# ========================================================== dedup: simhash


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash over the word multiset (per-bit majority vote)."""
    tune(spark)
    return dd.simhash(_load(spark, sf_dir, "documents"), "doc_id", "text")


def _oracle_simhash_cte() -> str:
    bits = " + ".join(
        f"(CASE WHEN sum(CASE WHEN (({sqlgen.shiftright('_h', i, DUCK)}) & 1) = 1 THEN 1 ELSE -1 END) >= 0"
        f" THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(32)
    )
    return f"""
  SELECT doc_id, CAST({bits} AS BIGINT) AS simhash
  FROM (
    SELECT doc_id, {sqlgen.hexfold_i64('_m')} AS _h
    FROM (SELECT doc_id, md5(w) AS _m
          FROM (SELECT doc_id, unnest({sqlgen.split_words('text', DUCK)}) AS w FROM documents))
  )
  GROUP BY doc_id
"""


ORACLE_DEDUP_SIMHASH = f"SELECT * FROM (\n{_oracle_simhash_cte()}\n)"


def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: share ≥1 of 4 8-bit bands AND hamming ≤ 3."""
    tune(spark)
    return dd.simhash_pairs(_load(spark, sf_dir, "documents"), "doc_id", "text")


ORACLE_DEDUP_SIMHASH_PAIRS = f"""
WITH sig AS ({_oracle_simhash_cte()})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND (
     (a.simhash & 255) = (b.simhash & 255)
  OR (({sqlgen.shiftright('a.simhash', 8, DUCK)}) & 255) = (({sqlgen.shiftright('b.simhash', 8, DUCK)}) & 255)
  OR (({sqlgen.shiftright('a.simhash', 16, DUCK)}) & 255) = (({sqlgen.shiftright('b.simhash', 16, DUCK)}) & 255)
  OR (({sqlgen.shiftright('a.simhash', 24, DUCK)}) & 255) = (({sqlgen.shiftright('b.simhash', 24, DUCK)}) & 255))
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


# ====================================================== similarity search


def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for query vectors (vec_id < 10),
    ranked on the *rounded* score so both engines rank identically."""
    tune(spark)
    return sim.topk_bruteforce(_load(spark, sf_dir, "embeddings"), k=5, n_queries=10)


ORACLE_SIMILARITY_TOPK = """
WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings WHERE vec_id < 10),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         CAST(ROUND(10000.0 * list_dot_product(q.embedding, e.embedding) /
              (sqrt(list_dot_product(q.embedding, q.embedding)) * sqrt(list_dot_product(e.embedding, e.embedding)))) AS BIGINT) AS cosine_c
  FROM q JOIN e ON e.vec_id <> q.vec_id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine_c DESC, neighbor_id ASC) AS BIGINT) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, cosine_c, rnk FROM ranked WHERE rnk <= 5
"""


def q_similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k (k-means coarse quantizer + cell equi-join) run in
    exhaustive-probe mode (n_probe = n_cells), where it must equal the exact
    brute force — the oracle gates the quantizer/assignment/join/scoring
    machinery; selective-probe recall is pytest-covered
    (tests/test_similarity.py)."""
    tune(spark)
    return sim.topk_ivf(
        _load(spark, sf_dir, "embeddings"), k=5, n_queries=10, n_cells=8, n_probe=8
    )


def q_similarity_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (LSH-bucketed + exact verify).
    Approximate by construction → rows-only check (an exact SQL oracle would
    assert recall the LSH path intentionally trades away)."""
    tune(spark)
    # n_planes auto-derives from the corpus count (auto_planes) so bucket
    # depth stays bounded as the corpus grows; 2 tables OR-amplify recall.
    return sim.embedding_near_dup(_load(spark, sf_dir, "embeddings"), threshold_c=3000)


def q_similarity_embed_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate embedding detection via canonical vector fingerprint."""
    tune(spark)
    return sim.embedding_exact_dup(_load(spark, sf_dir, "embeddings"))


def q_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-column profiling: per-vector dimension, L2 norm, mean and
    min/max component — the sanity pass before any ANN build (catches
    zero/denormal vectors and dimension drift).  All JVM-side higher-order
    array functions (aggregate/size/array_min/array_max), no Python."""
    tune(spark)
    emb = _load(spark, sf_dir, "embeddings")
    sumsq = (
        "aggregate(embedding, CAST(0.0 AS DOUBLE), "
        "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
    )
    total = "aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE))"
    return emb.select(
        "vec_id",
        F.expr("CAST(size(embedding) AS BIGINT)").alias("dim"),
        F.expr(f"CAST(ROUND(10000.0 * sqrt({sumsq})) AS BIGINT)").alias("norm_c"),
        F.expr(f"CAST(ROUND(10000.0 * {total} / size(embedding)) AS BIGINT)").alias("mean_c"),
        F.expr("CAST(ROUND(10000.0 * CAST(array_min(embedding) AS DOUBLE)) AS BIGINT)").alias("min_c"),
        F.expr("CAST(ROUND(10000.0 * CAST(array_max(embedding) AS DOUBLE)) AS BIGINT)").alias("max_c"),
    )


ORACLE_EMBEDDING_STATS = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT vec_id,
       CAST(len(v) AS BIGINT) AS dim,
       CAST(ROUND(10000.0 * sqrt(list_dot_product(v, v))) AS BIGINT) AS norm_c,
       CAST(ROUND(10000.0 * list_sum(v) / len(v)) AS BIGINT) AS mean_c,
       CAST(ROUND(10000.0 * list_min(v)) AS BIGINT) AS min_c,
       CAST(ROUND(10000.0 * list_max(v)) AS BIGINT) AS max_c
FROM e
"""


def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language embedding centroid summary: element-wise mean vector via
    posexplode → (group, position) aggregation — the distributed
    vector-reduce shape (map-side partial sums per component, one shuffle
    keyed on (lang, pos)) that k-means assignment/update steps are built
    from.  Reported as (n_vecs, dim, centroid L2 norm) per language."""
    tune(spark)
    emb = _load(spark, sf_dir, "embeddings")
    docs = _load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "lang"
    )
    j = emb.join(docs, "vec_id")
    comp = j.select(
        "lang", F.posexplode("embedding").alias("pos", "x")
    ).withColumn("xd", F.expr("CAST(x AS DOUBLE)"))
    cent = comp.groupBy("lang", "pos").agg(F.avg("xd").alias("m"))
    norms = cent.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("dim"),
        F.expr("CAST(ROUND(10000.0 * sqrt(sum(m * m))) AS BIGINT)").alias("centroid_norm_c"),
    )
    counts = j.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n_vecs"))
    return norms.join(counts, "lang").select("lang", "n_vecs", "dim", "centroid_norm_c")


ORACLE_EMBEDDING_CENTROIDS = """
WITH j AS (
  SELECT e.vec_id, d.lang, CAST(e.embedding AS DOUBLE[]) AS v
  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
),
comp AS (
  SELECT lang, pos, v[pos] AS x
  FROM (SELECT lang, v, unnest(generate_series(1, len(v))) AS pos FROM j)
),
cent AS (SELECT lang, pos, avg(x) AS m FROM comp GROUP BY lang, pos),
norms AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS dim,
         CAST(ROUND(10000.0 * sqrt(sum(m * m))) AS BIGINT) AS centroid_norm_c
  FROM cent GROUP BY lang
),
counts AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_vecs FROM j GROUP BY lang)
SELECT norms.lang, n_vecs, dim, centroid_norm_c FROM norms JOIN counts ON norms.lang = counts.lang
"""


ORACLE_SIMILARITY_EMBED_DUP = f"""
SELECT CAST({sqlgen.hexfold_i64('_m')} AS BIGINT) AS vec_fp,
       CAST(min(vec_id) AS BIGINT) AS keep_vec_id,
       CAST(count(*) AS BIGINT) AS n_dups
FROM (SELECT vec_id,
             md5(array_to_string(list_transform(embedding,
                 x -> CAST(CAST(ROUND(CAST(x AS DOUBLE) * 100000) AS BIGINT) AS VARCHAR)), ',')) AS _m
      FROM embeddings)
GROUP BY 1
"""


# =========================================================== text analysis


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring stats: tokens, chars, mean word length, stopword and
    punctuation counts."""
    tune(spark)
    return tx.text_stats(_load(spark, sf_dir, "documents"))


def _sw_list_sql(words: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in words)


ALL_STOPWORDS = sorted({w for ws in STOPWORDS.values() for w in ws})

ORACLE_TEXT_STATS = f"""
WITH base AS (SELECT doc_id, text, {sqlgen.split_words('text', DUCK)} AS ws FROM documents)
SELECT doc_id,
       CAST(len(ws) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(ROUND(10000.0 * (length(text) - len(ws) + 1) / len(ws)) AS BIGINT) AS mean_word_len_c,
       CAST(len(list_filter(ws, x -> x IN ({_sw_list_sql(ALL_STOPWORDS)}))) AS BIGINT) AS n_stopwords,
       CAST(length(text) - length(replace(replace(replace(text, '.', ''), ',', ''), '!', '')) AS BIGINT) AS n_punct
FROM base
"""


def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting for training-data budgeting: whitespace words plus a
    BPE-ish subword estimate (1 extra token per 6 chars beyond a word's
    first 6) — all JVM-side higher-order array functions, no UDF."""
    tune(spark)
    docs = _load(spark, sf_dir, "documents").select("doc_id", "text")
    return tx.token_count(docs).select("doc_id", "n_words", "n_tokens_bpe")


ORACLE_TEXT_TOKENS = f"""
WITH base AS (SELECT doc_id, {sqlgen.split_words('text', DUCK)} AS ws FROM documents)
SELECT doc_id,
       CAST(len(ws) AS BIGINT) AS n_words,
       CAST(len(ws) + list_sum(list_transform(ws,
            w -> CAST(floor(greatest(length(w) - 6, 0) / 6.0) AS BIGINT))) AS BIGINT) AS n_tokens_bpe
FROM base
"""


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization (the pre-pass before exact dedup):
    lowercase, strip sentence punctuation, collapse whitespace runs, trim.
    Pure JVM string functions; the normalized text plus its byte delta are
    returned so the oracle verifies the transform itself."""
    tune(spark)
    docs = _load(spark, sf_dir, "documents").select("doc_id", "text")
    stripped = "replace(replace(replace(lower(text), '.', ''), ',', ''), '!', '')"
    norm = f"trim(regexp_replace({stripped}, ' +', ' '))"
    return docs.select(
        "doc_id",
        F.expr(norm).alias("norm_text"),
        F.expr(f"CAST(length(text) - length({norm}) AS BIGINT)").alias("chars_removed"),
    )


ORACLE_TEXT_NORMALIZE = """
SELECT doc_id, norm_text,
       CAST(length(text) - length(norm_text) AS BIGINT) AS chars_removed
FROM (
  SELECT doc_id, text,
         trim(regexp_replace(replace(replace(replace(lower(text), '.', ''), ',', ''), '!', ''), ' +', ' ', 'g')) AS norm_text
  FROM documents
)
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality gate: per-rule pass flags + keep
    conjunction (token bounds, mean-word-length band, punctuation cap,
    stopword floor) — the filter stage in front of dedup."""
    tune(spark)
    return tx.quality_flags(_load(spark, sf_dir, "documents"))


ORACLE_TEXT_QUALITY = f"""
WITH stats AS ({ORACLE_TEXT_STATS})
SELECT doc_id, n_tokens,
       CAST(CASE WHEN n_tokens >= 20 AND n_tokens <= 100000 THEN 1 ELSE 0 END AS BIGINT) AS ok_len,
       CAST(CASE WHEN mean_word_len_c >= 20000 AND mean_word_len_c <= 100000 THEN 1 ELSE 0 END AS BIGINT) AS ok_word_len,
       CAST(CASE WHEN CAST(ROUND(10000.0 * n_punct / greatest(n_chars, 1)) AS BIGINT) <= 1000 THEN 1 ELSE 0 END AS BIGINT) AS ok_punct,
       CAST(CASE WHEN CAST(ROUND(10000.0 * n_stopwords / greatest(n_tokens, 1)) AS BIGINT) >= 200 THEN 1 ELSE 0 END AS BIGINT) AS ok_stopwords,
       CAST((CASE WHEN n_tokens >= 20 AND n_tokens <= 100000 THEN 1 ELSE 0 END)
          * (CASE WHEN mean_word_len_c >= 20000 AND mean_word_len_c <= 100000 THEN 1 ELSE 0 END)
          * (CASE WHEN CAST(ROUND(10000.0 * n_punct / greatest(n_chars, 1)) AS BIGINT) <= 1000 THEN 1 ELSE 0 END)
          * (CASE WHEN CAST(ROUND(10000.0 * n_stopwords / greatest(n_tokens, 1)) AS BIGINT) >= 200 THEN 1 ELSE 0 END) AS BIGINT) AS keep
FROM stats
"""


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-overlap language ID (argmax score, alphabetical tie-break)."""
    tune(spark)
    return tx.lang_id(_load(spark, sf_dir, "documents"))


def _oracle_langid() -> str:
    scores = ", ".join(
        f"CAST(len(list_filter(ws, x -> x IN ({_sw_list_sql(ws_list)}))) AS BIGINT) AS c_{lang}"
        for lang, ws_list in sorted(STOPWORDS.items())
    )
    langs = sorted(STOPWORDS)
    armax = "CASE " + " ".join(
        f"WHEN c_{la} >= greatest({', '.join('c_' + lb for lb in langs if lb != la)}) THEN '{la}'"
        for la in langs
    ) + " END"
    return f"""
WITH base AS (SELECT doc_id, lang, {sqlgen.split_words('text', DUCK)} AS ws FROM documents),
scored AS (SELECT doc_id, lang, {scores} FROM base)
SELECT doc_id, lang AS labeled_lang, {armax} AS pred_lang,
       {", ".join("c_" + la for la in langs)}
FROM scored
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent document fingerprint: XOR of hashes of distinct word
    3-shingles (whole text when shorter than 3 tokens)."""
    tune(spark)
    return tx.fingerprint(_load(spark, sf_dir, "documents"))


ORACLE_TEXT_FINGERPRINT = f"""
WITH base AS (SELECT doc_id, text, {sqlgen.split_words('text', DUCK)} AS ws FROM documents),
shingles AS (
  SELECT DISTINCT doc_id, sh FROM (
    SELECT doc_id, unnest(CASE WHEN len(ws) >= 3
        THEN list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
        ELSE [text] END) AS sh
    FROM base
  )
)
SELECT doc_id, CAST(bit_xor({sqlgen.hexfold_i64('_m')}) AS BIGINT) AS fingerprint
FROM (SELECT doc_id, md5(sh) AS _m FROM shingles)
GROUP BY doc_id
"""


# ============================================================== multimodal


def q_text_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing rolling-hash fingerprints (char 5-grams, window 4) reduced
    to a per-doc summary: fingerprint count + XOR — deterministic and
    engine-stable."""
    tune(spark)
    fps = tx.winnow_fingerprints(_load(spark, sf_dir, "documents"), "doc_id", "text", k=5, w=4)
    return fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_fp"),
        F.bit_xor("fp").cast("long").alias("fp_xor"),
    )


ORACLE_TEXT_WINNOW = f"""
WITH pos_exploded AS (
  SELECT doc_id, text, length(text) AS _len,
         unnest(generate_series(0, greatest(length(text) - 5, 0))) AS pos
  FROM documents
),
grams AS (
  SELECT doc_id, _len, pos, substr(text, pos + 1, 5) AS gram FROM pos_exploded
),
hashed AS (
  SELECT doc_id, _len, pos, ({sqlgen.hexfold_i64('_m')}) & 1073741823 AS h
  FROM (SELECT doc_id, _len, pos, md5(gram) AS _m FROM grams)
),
wins AS (
  SELECT doc_id, pos, _len,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
  FROM hashed
),
sel AS (
  SELECT DISTINCT doc_id, wmin AS fp FROM wins
  WHERE pos <= greatest(_len - 4, 1) - 4 OR pos = 0
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp, CAST(bit_xor(fp) AS BIGINT) AS fp_xor
FROM sel GROUP BY doc_id
"""


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: treat text payloads as opaque binary, extract
    typed metadata (byte length, content id, chunk count).  The decode /
    feature-extraction UDFs live in operators/multimodal.py (stubbed decode,
    real Spark plumbing)."""
    tune(spark)
    from tikv_data_compare_spark.operators import multimodal as mm

    return mm.payload_meta(_load(spark, sf_dir, "documents"))


ORACLE_MULTIMODAL_META = f"""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST({sqlgen.hexfold_i64('_m')} AS BIGINT) AS content_id,
       CAST(ceil(octet_length(encode(text)) / 1024.0) AS BIGINT) AS n_chunks
FROM (SELECT doc_id, text, md5(text) AS _m FROM documents)
"""


# Binary-synthesis helpers (Spark SQL): big/little-endian ints for building
# real media headers JVM-side, so the Python parsers are tested against
# payloads they did not construct.


def _u32be(e: str) -> str:
    return f"unhex(lpad(hex(CAST({e} AS BIGINT)), 8, '0'))"


def _le(b: str, n: int) -> str:
    """Reverse the n bytes of binary expr b (big→little endian)."""
    parts = ", ".join(f"substring({b}, {i}, 1)" for i in range(n, 0, -1))
    return f"concat({parts})"


def _u32le(e: str) -> str:
    return _le(_u32be(e), 4)


def _u16le(e: str) -> str:
    return _le(f"unhex(lpad(hex(CAST({e} AS BIGINT)), 4, '0'))", 2)


IMG_W = "(doc_id % 640 + 16)"
IMG_H = "(doc_id % 480 + 16)"


def q_multimodal_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image header metadata over synthesized binary payloads: a third of the
    corpus gets a real PNG signature+IHDR (big-endian dims), a third a GIF89a
    logical screen (little-endian dims), a third raw text bytes (parses to
    NULLs).  The payload bytes are built JVM-side (concat/unhex/substring)
    and parsed back by the decode-free Python header parser in an Arrow
    batch (operators/multimodal.py image_dims) — the oracle recomputes the
    expected dims arithmetically, so a parser endianness or offset bug
    hash-mismatches."""
    tune(spark)
    from tikv_data_compare_spark.operators import multimodal as mm

    docs = _load(spark, sf_dir, "documents").select("doc_id", "text")
    png = (
        "concat(unhex('89504E470D0A1A0A'), unhex('0000000D'), CAST('IHDR' AS BINARY), "
        f"{_u32be(IMG_W)}, {_u32be(IMG_H)})"
    )
    gif = f"concat(CAST('GIF89a' AS BINARY), {_u16le(IMG_W)}, {_u16le(IMG_H)})"
    synth = docs.withColumn(
        "payload",
        F.expr(
            f"CASE WHEN doc_id % 3 = 0 THEN {png} WHEN doc_id % 3 = 1 THEN {gif} "
            "ELSE CAST(text AS BINARY) END"
        ),
    )
    return mm.image_dims(synth)


ORACLE_MULTIMODAL_IMAGE = f"""
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'png' WHEN doc_id % 3 = 1 THEN 'gif' END AS format,
       CAST(CASE WHEN doc_id % 3 <= 1 THEN {IMG_W} END AS BIGINT) AS width,
       CAST(CASE WHEN doc_id % 3 <= 1 THEN {IMG_H} END AS BIGINT) AS height
FROM documents
"""

WAV_CH = "(1 + doc_id % 2)"
WAV_SR = "(CASE WHEN doc_id % 3 = 0 THEN 8000 WHEN doc_id % 3 = 1 THEN 16000 ELSE 44100 END)"
WAV_BITS = "(CASE WHEN doc_id % 5 < 2 THEN 8 ELSE 16 END)"
WAV_DSZ = "(octet_length(text) * 100 + 44)"


def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio header metadata: RIFF/WAVE headers synthesized JVM-side with
    per-doc channels/sample-rate/bit-depth/payload-size (all little-endian
    fields built via concat/unhex/substring), one seventh of the corpus left
    as raw text (parses to NULLs).  The chunk-walking Python parser
    (operators/multimodal.py audio_meta) extracts the fields in an Arrow
    batch; duration is derived JVM-side from the parsed fields.  The oracle
    recomputes every field arithmetically."""
    tune(spark)
    from tikv_data_compare_spark.operators import multimodal as mm

    docs = _load(spark, sf_dir, "documents").select("doc_id", "text")
    byte_rate = f"(({WAV_SR} * {WAV_CH} * {WAV_BITS}) DIV 8)"
    block_align = f"(({WAV_CH} * {WAV_BITS}) DIV 8)"
    wav = (
        f"concat(CAST('RIFF' AS BINARY), {_u32le(f'36 + {WAV_DSZ}')}, CAST('WAVE' AS BINARY), "
        f"CAST('fmt ' AS BINARY), {_u32le('16')}, {_u16le('1')}, {_u16le(WAV_CH)}, "
        f"{_u32le(WAV_SR)}, {_u32le(byte_rate)}, {_u16le(block_align)}, {_u16le(WAV_BITS)}, "
        f"CAST('data' AS BINARY), {_u32le(WAV_DSZ)})"
    )
    synth = docs.withColumn(
        "payload",
        F.expr(f"CASE WHEN doc_id % 7 = 3 THEN CAST(text AS BINARY) ELSE {wav} END"),
    )
    return mm.audio_meta(synth).withColumn(
        "duration_ms",
        F.expr("CAST((data_size * 8000) DIV (sample_rate * channels * bits) AS BIGINT)"),
    )


ORACLE_MULTIMODAL_AUDIO = f"""
WITH p AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 3 THEN NULL ELSE {WAV_CH} END AS channels,
         CASE WHEN doc_id % 7 = 3 THEN NULL ELSE {WAV_SR} END AS sample_rate,
         CASE WHEN doc_id % 7 = 3 THEN NULL ELSE {WAV_BITS} END AS bits,
         CASE WHEN doc_id % 7 = 3 THEN NULL ELSE octet_length(encode(text)) * 100 + 44 END AS data_size
  FROM documents
)
SELECT doc_id, CAST(channels AS BIGINT) AS channels, CAST(sample_rate AS BIGINT) AS sample_rate,
       CAST(bits AS BIGINT) AS bits, CAST(data_size AS BIGINT) AS data_size,
       CAST((data_size * 8000) // (sample_rate * channels * bits) AS BIGINT) AS duration_ms
FROM p
"""


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plumbing: one row per sampled 64-byte chunk offset of
    each payload, offsets computed JVM-side via sequence+posexplode (the
    Spark shape of video frame extraction — the per-frame decode itself
    stays a mapInPandas stub, operators/multimodal.py frame_sample)."""
    tune(spark)
    from tikv_data_compare_spark.operators import multimodal as mm

    fs = mm.frame_sample(_load(spark, sf_dir, "documents"), every_n_bytes=64)
    return fs.select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.col("byte_offset").cast("long").alias("byte_offset"),
    )


ORACLE_MULTIMODAL_FRAMES = """
SELECT doc_id, CAST(off // 64 AS BIGINT) AS frame_idx, CAST(off AS BIGINT) AS byte_offset
FROM (
  SELECT doc_id,
         unnest(generate_series(0, greatest(octet_length(encode(text)) - 1, 0), 64)) AS off
  FROM documents
)
"""


# ============================================================== sampling


def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% Bernoulli corpus sample keyed on content hash
    (operators/sampling.py) — replay-safe subsampling, the op every corpus
    ablation starts with.  Map-only: no shuffle, no RNG state."""
    tune(spark)
    from tikv_data_compare_spark.operators.sampling import hash_sample

    docs = _load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return hash_sample(docs, "text", pct=10).select("doc_id", "lang", "sample_bucket")


ORACLE_SAMPLE_HASH = f"""
SELECT doc_id, lang, CAST((({sqlgen.hexfold_i64('_m')} % 100) + 100) % 100 AS BIGINT) AS sample_bucket
FROM (SELECT doc_id, lang, md5(text) AS _m FROM documents)
WHERE (({sqlgen.hexfold_i64('_m')} % 100) + 100) % 100 < 10
"""


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample: 20 docs per language in content-hash order with
    doc_id tiebreak — the per-stratum quota that keeps low-resource
    languages represented.  Bounded output per group regardless of group
    size (skew-safe by construction)."""
    tune(spark)
    from tikv_data_compare_spark.operators.sampling import stratified_sample

    docs = _load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    out = stratified_sample(docs, ["lang"], k=20, tiebreak_cols=["doc_id"])
    return out.select("doc_id", "lang", "sample_rank")


ORACLE_SAMPLE_STRATIFIED = f"""
SELECT doc_id, lang, CAST(rn AS BIGINT) AS sample_rank
FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY {sqlgen.hexfold_i64('_m')}, doc_id) AS rn
  FROM (SELECT doc_id, lang, md5(text) AS _m FROM documents)
)
WHERE rn <= 20
"""


# ===================================================== pipeline capstone


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data curation pipeline in one plan:
    exact dedup → near-dup removal (minhash candidates verified by Jaccard ≥
    0.8, keep the lower doc_id) → quality filter (token count ≥ 30) →
    per-language corpus summary.  The composition a pipeline user actually
    runs; every stage is the library operator, one lazily-optimized plan.
    """
    tune(spark)
    docs = _load(spark, sf_dir, "documents")
    deduped = dd.dedup_exact(docs, "doc_id", "text")
    # shingle once: the near-dup stage needs the shingle set for BOTH the
    # minhash candidates and the exact Jaccard verify — cache one frame and
    # thread it through, instead of re-exploding the corpus per stage
    shingles = dd.distinct_shingles(docs, "doc_id", "text").cache()
    losers = (
        dd.jaccard_pairs(docs, "doc_id", "text", shingles=shingles)
        .filter(F.col("jaccard_c") >= 8000)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    survivors = deduped.join(losers, "doc_id", "left_anti")
    stats = tx.text_stats(survivors)
    quality = stats.filter(F.col("n_tokens") >= 30).select("doc_id", "n_tokens", "n_chars")
    return (
        survivors.select("doc_id", "lang")
        .join(quality, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
        .select(
            "lang",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("total_tokens").cast("long").alias("total_tokens"),
            F.col("total_chars").cast("long").alias("total_chars"),
        )
    )


def _oracle_curation_pipeline() -> str:
    return f"""
WITH sig AS ({_oracle_minhash_sig_cte()}),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND (
       (a.m0 = b.m0 AND a.m1 = b.m1) OR (a.m2 = b.m2 AND a.m3 = b.m3)
    OR (a.m4 = b.m4 AND a.m5 = b.m5) OR (a.m6 = b.m6 AND a.m7 = b.m7))
),
words AS ({DUCK_SHINGLES}),
sizes AS (SELECT doc_id, count(*) AS n FROM words GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS ninter
  FROM cand c JOIN words wa ON wa.doc_id = c.doc_a JOIN words wb ON wb.doc_id = c.doc_b AND wa.w = wb.w
  GROUP BY c.doc_a, c.doc_b
),
losers AS (
  SELECT DISTINCT c.doc_b AS doc_id
  FROM cand c JOIN sizes sa ON sa.doc_id = c.doc_a JOIN sizes sb ON sb.doc_id = c.doc_b
  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
  WHERE CAST(ROUND(10000.0 * coalesce(i.ninter, 0) / (sa.n + sb.n - coalesce(i.ninter, 0))) AS BIGINT) >= 8000
),
exact_keep AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
survivors AS (
  SELECT d.* FROM documents d
  JOIN exact_keep k ON k.doc_id = d.doc_id
  WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)
),
quality AS (
  SELECT doc_id, len({sqlgen.split_words('text', DUCK)}) AS n_tokens, length(text) AS n_chars
  FROM survivors
  WHERE len({sqlgen.split_words('text', DUCK)}) >= 30
)
SELECT s.lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(q.n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(q.n_chars) AS BIGINT) AS total_chars
FROM survivors s JOIN quality q ON q.doc_id = s.doc_id
GROUP BY s.lang
"""


# ------------------------------------------------------------------- registry


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "dedup_exact": q_dedup_exact,
        "stream_dedup": q_stream_dedup,
        "dedup_minhash_sig": q_dedup_minhash_sig,
        "dedup_minhash_pairs": q_dedup_minhash_pairs,
        "dedup_jaccard": q_dedup_jaccard,
        "dedup_components": q_dedup_components,
        "dedup_simhash": q_dedup_simhash,
        "dedup_simhash_pairs": q_dedup_simhash_pairs,
        "similarity_topk": q_similarity_topk,
        "similarity_topk_ivf": q_similarity_topk_ivf,
        "similarity_near_dup": q_similarity_near_dup,
        "similarity_embed_dup": q_similarity_embed_dup,
        "embedding_stats": q_embedding_stats,
        "embedding_centroids": q_embedding_centroids,
        "text_stats": q_text_stats,
        "text_tokens": q_text_tokens,
        "text_normalize": q_text_normalize,
        "text_quality": q_text_quality,
        "text_langid": q_text_langid,
        "text_fingerprint": q_text_fingerprint,
        "text_winnow": q_text_winnow,
        "multimodal_meta": q_multimodal_meta,
        "multimodal_image": q_multimodal_image,
        "multimodal_audio": q_multimodal_audio,
        "multimodal_frames": q_multimodal_frames,
        "sample_hash": q_sample_hash,
        "sample_stratified": q_sample_stratified,
        "curation_pipeline": q_curation_pipeline,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "dedup_exact": ORACLE_DEDUP_EXACT,
        "stream_dedup": ORACLE_STREAM_DEDUP,
        "dedup_minhash_sig": ORACLE_DEDUP_MINHASH_SIG,
        "dedup_minhash_pairs": ORACLE_DEDUP_MINHASH_PAIRS,
        "dedup_jaccard": ORACLE_DEDUP_JACCARD,
        "dedup_components": ORACLE_DEDUP_COMPONENTS,
        "dedup_simhash": ORACLE_DEDUP_SIMHASH,
        "dedup_simhash_pairs": ORACLE_DEDUP_SIMHASH_PAIRS,
        "similarity_topk": ORACLE_SIMILARITY_TOPK,
        "similarity_topk_ivf": ORACLE_SIMILARITY_TOPK,
        "similarity_embed_dup": ORACLE_SIMILARITY_EMBED_DUP,
        "embedding_stats": ORACLE_EMBEDDING_STATS,
        "embedding_centroids": ORACLE_EMBEDDING_CENTROIDS,
        "text_stats": ORACLE_TEXT_STATS,
        "text_tokens": ORACLE_TEXT_TOKENS,
        "text_normalize": ORACLE_TEXT_NORMALIZE,
        "text_quality": ORACLE_TEXT_QUALITY,
        "text_langid": _oracle_langid(),
        "text_fingerprint": ORACLE_TEXT_FINGERPRINT,
        "text_winnow": ORACLE_TEXT_WINNOW,
        "multimodal_meta": ORACLE_MULTIMODAL_META,
        "multimodal_image": ORACLE_MULTIMODAL_IMAGE,
        "multimodal_audio": ORACLE_MULTIMODAL_AUDIO,
        "multimodal_frames": ORACLE_MULTIMODAL_FRAMES,
        "sample_hash": ORACLE_SAMPLE_HASH,
        "sample_stratified": ORACLE_SAMPLE_STRATIFIED,
        "curation_pipeline": _oracle_curation_pipeline(),
    }
