"""Deduplication operators for training-data pipelines.

Grounded in the engine's comparison machinery (exact dedup ≍ self-diff on a
content hash; near-dup ≍ approximate diff — SURVEY.md §2.7) and designed for
100 TB shapes:

- exact:   one groupBy on a 60-bit content hash (partial agg, one shuffle).
- minhash: explode→distinct→agg signatures, then LSH *band equi-join* —
  candidates meet in a shuffle on (band, hash), never a cartesian product.
- simhash: per-bit majority over word hashes (one explode + one agg), pairs
  via 8-bit band equi-join + hamming filter.
- jaccard: exact verification restricted to LSH candidates.

The minhash/simhash/jaccard operators take ``algo`` (exact dedup is
md5-only — its content hash must stay oracle-checkable):

- ``md5i64`` (default): cross-engine md5-fold (functions/sqlgen.py) — every
  query is DuckDB-oracle checkable bit-for-bit.
- ``xxhash64``: Spark's built-in JVM hash — same plan shape, no md5/hexfold
  expression tree, ~3-5× faster; the throughput path (bench.py uses it),
  mirroring checksum.py's algo switch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tikv_data_compare_spark.functions import sqlgen

H30_MASK = (1 << 30) - 1

ALGOS = ("md5i64", "xxhash64")


def _check_algo(algo: str) -> None:
    if algo not in ALGOS:  # mirror checksum._with_hash: typos must not silently fall back
        raise ValueError(f"unknown algo {algo!r}; expected one of {ALGOS}")


def _minhash_constants():
    from tikv_data_compare_spark.queries import MINHASH_P, MINHASH_PERMS

    return MINHASH_PERMS, MINHASH_P


def exact_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact-duplicate groups by content hash: (content_id, keep_doc_id, n_dups)."""
    hashed = df.withColumn("_m", F.md5(F.col(text_col))).withColumn(
        "content_id", F.expr(sqlgen.hexfold_i64("_m")).cast("long")
    )
    return hashed.groupBy("content_id").agg(
        F.min(id_col).cast("long").alias(f"keep_{id_col}"),
        F.count(F.lit(1)).cast("long").alias("n_dups"),
    )


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one representative row (min id) per exact content group."""
    keep = exact_groups(df, id_col, text_col).select(
        F.col(f"keep_{id_col}").alias(id_col)
    )
    return df.join(keep, on=id_col, how="left_semi")


def _distinct_words(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).distinct()


def _distinct_shingles(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Distinct word 3-shingles per doc (whole text when < 3 tokens).

    Shingles, not words: with a small vocabulary, word *sets* of long docs
    converge to the whole vocabulary and word-minhash collides on nearly
    every pair; 3-gram sequences stay diverse (standard shingling).

    ``split(text)`` is hoisted into a projected ``_toks`` column so the
    tokenization runs once per row, not 5× inside the shingle expression.
    """
    toks = df.select(
        F.col(id_col),
        F.col(text_col).alias("_txt"),
        F.split(F.col(text_col), " ").alias("_toks"),
    )
    return toks.select(
        id_col,
        F.explode(
            F.expr(
                "CASE WHEN size(_toks) >= 3 THEN "
                "transform(sequence(0, size(_toks) - 3), "
                "i -> concat_ws(' ', _toks[i], _toks[i+1], _toks[i+2])) "
                "ELSE array(_txt) END"
            )
        ).alias("w"),
    ).distinct()


#: public name — pipelines precompute+cache this and pass it via ``shingles=``
distinct_shingles = _distinct_shingles


def _word_hash30(words: DataFrame, algo: str = "md5i64") -> DataFrame:
    """30-bit token hash `_h1`: md5-fold (oracle-checkable) or xxhash64 (fast)."""
    _check_algo(algo)
    if algo == "xxhash64":
        return words.withColumn("_h1", F.expr(f"xxhash64(w) & {H30_MASK}"))
    return words.withColumn("_m", F.md5("w")).withColumn(
        "_h1", F.expr(f"({sqlgen.hexfold_i64('_m')}) & {H30_MASK}")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    algo: str = "md5i64",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """8-permutation MinHash signature of each document's 3-shingle set.

    ``shingles`` lets a pipeline pass a precomputed (typically cached)
    ``distinct_shingles`` frame so composed plans explode the text once.
    """
    perms, p = _minhash_constants()
    if shingles is None:
        shingles = _distinct_shingles(df, id_col, text_col)
    hashed = _word_hash30(shingles, algo)
    aggs = [
        F.min((F.lit(a).cast("long") * F.col("_h1") + F.lit(b)) % F.lit(p))
        .cast("long")
        .alias(f"m{i}")
        for i, (a, b) in enumerate(perms)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def _band_rows(sig: DataFrame, id_col: str) -> DataFrame:
    """(id, band_idx, h1, h2) rows — one per 2-perm LSH band."""
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.col(f"m{2 * j}").alias("h1"),
                F.col(f"m{2 * j + 1}").alias("h2"),
            )
            for j in range(4)
        ]
    )
    return sig.select(id_col, F.explode(bands).alias("b")).select(
        id_col, F.col("b.band").alias("band"), F.col("b.h1").alias("h1"), F.col("b.h2").alias("h2")
    )


def minhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    algo: str = "md5i64",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs sharing ≥1 LSH band.

    Scale shape: the self-join is an equi-join on (band, h1, h2) — each
    bucket meets in one shuffle partition; no O(n²) comparison.  Hot buckets
    (giant near-dup clusters) are the skew case AQE's skew-join handles.
    """
    sig = minhash_signatures(df, id_col, text_col, algo, shingles=shingles)
    b = _band_rows(sig, id_col)
    a = b.select(F.col(id_col).alias("doc_a"), "band", "h1", "h2")
    c = b.select(F.col(id_col).alias("doc_b"), "band", "h1", "h2")
    return (
        a.join(c, on=["band", "h1", "h2"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    algo: str = "md5i64",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard (scaled ×10000) for minhash candidate pairs.

    The shingle set feeds BOTH the minhash candidates and the exact verify;
    pass a cached ``distinct_shingles`` frame (or let this function build
    one) so the composed plan tokenizes each document once, not per stage.
    """
    if shingles is None:
        shingles = _distinct_shingles(df, id_col, text_col)
    cand = minhash_pairs(df, id_col, text_col, algo, shingles=shingles)
    words = shingles
    sizes = words.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    wa = words.select(F.col(id_col).alias("doc_a"), "w")
    wb = words.select(F.col(id_col).alias("doc_b"), "w")
    inter = (
        cand.join(wa, on="doc_a")
        .join(wb, on=["doc_b", "w"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("ninter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n").alias("nb"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .join(inter, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            F.expr(
                "CAST(ROUND(10000.0 * coalesce(ninter, 0) / (na + nb - coalesce(ninter, 0))) AS BIGINT)"
            ).alias("jaccard_c"),
        )
    )


def simhash(df: DataFrame, id_col: str, text_col: str, algo: str = "md5i64") -> DataFrame:
    """32-bit SimHash over the word multiset (per-bit majority vote)."""
    _check_algo(algo)
    words = df.select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("w"))
    if algo == "xxhash64":
        hashed = words.withColumn("_h", F.xxhash64("w"))
    else:
        hashed = words.withColumn("_m", F.md5("w")).withColumn(
            "_h", F.expr(sqlgen.hexfold_i64("_m"))
        )
    bits = " + ".join(
        f"(CASE WHEN sum(CASE WHEN (({sqlgen.shiftright('_h', i, sqlgen.SPARK)}) & 1) = 1 THEN 1 ELSE -1 END) >= 0"
        f" THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(32)
    )
    return hashed.groupBy(id_col).agg(F.expr(f"CAST({bits} AS BIGINT)").alias("simhash"))


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3, algo: str = "md5i64"
) -> DataFrame:
    """Near-dup pairs: share ≥1 of four 8-bit simhash bands, hamming ≤ k.

    Same scale shape as minhash_pairs: band equi-join, then cheap bit_count
    verification on the candidates only.
    """
    sig = simhash(df, id_col, text_col, algo)
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.expr(f"(({sqlgen.shiftright('simhash', 8 * j, sqlgen.SPARK)}) & 255)").alias("bv"),
            )
            for j in range(4)
        ]
    )
    b = sig.select(id_col, "simhash", F.explode(bands).alias("b")).select(
        id_col, "simhash", F.col("b.band").alias("band"), F.col("b.bv").alias("bv")
    )
    a = b.select(F.col(id_col).alias("doc_a"), F.col("simhash").alias("sim_a"), "band", "bv")
    c = b.select(F.col(id_col).alias("doc_b"), F.col("simhash").alias("sim_b"), "band", "bv")
    return (
        a.join(c, on=["band", "bv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.expr("CAST(bit_count(sim_a ^ sim_b) AS BIGINT)").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
