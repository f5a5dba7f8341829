"""Parity fuzz for the r7 map-side rewrites (SURVEY §5.3 style).

The minhash/simhash/jaccard/fingerprint/winnow/repetition operators were
rewritten from explode→shuffle shapes to array higher-order functions; the
DuckDB oracles pin them on fixture data, and these tests pin them against
straight-line *reference implementations of the old explode shapes* on
seeded adversarial corpora the fixtures don't contain: empty documents,
consecutive-space empty tokens, unicode tokens, heavy repetition,
single-token docs, and NULL text.  Any semantic drift between the map-side
expressions and the old shapes shows up as a row-set mismatch here.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window, functions as F

from tikv_data_compare_spark.functions import sqlgen
from tikv_data_compare_spark.operators import dedup as dd
from tikv_data_compare_spark.operators import text as tx

TOKENS = ["a", "b", "ab", "ba", "é", "ключ", "x1", "", "zz", "a"]


def _corpus(spark, seed: int, n_docs: int = 60):
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        kind = rng.randrange(6)
        if kind == 0:
            text = ""  # empty doc → single empty token
        elif kind == 1:
            text = rng.choice(TOKENS)  # single token
        elif kind == 2:
            text = " ".join([rng.choice(TOKENS[:3])] * rng.randrange(2, 30))  # heavy repetition
        elif kind == 3:
            text = None  # NULL text
        else:
            text = " ".join(rng.choice(TOKENS) for _ in range(rng.randrange(2, 40)))
        rows.append((i, text))
    # two exact dup pairs so candidate pairs exist
    rows.append((1000, rows[0][1]))
    rows.append((1001, rows[4][1]))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rowset(df):
    return sorted(tuple(r) for r in df.collect())


def _ref_shingles(df):
    """The r6 explode→distinct shingle frame."""
    toks = df.select(
        "doc_id", F.col("text").alias("_txt"), F.split("text", " ").alias("_toks")
    )
    return toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(_toks) >= 3 THEN "
                "transform(sequence(0, size(_toks) - 3), "
                "i -> concat_ws(' ', _toks[i], _toks[i+1], _toks[i+2])) "
                "ELSE array(_txt) END"
            )
        ).alias("w"),
    ).distinct()


def _ref_minhash_sigs(df, algo: str):
    from tikv_data_compare_spark.queries import MINHASH_P, MINHASH_PERMS

    sh = _ref_shingles(df)
    if algo == "xxhash64":
        hashed = sh.withColumn("_h1", F.expr(f"xxhash64(w) & {dd.H30_MASK}"))
    else:
        hashed = sh.withColumn("_m", F.md5("w")).withColumn(
            "_h1", F.expr(f"({sqlgen.hexfold_i64('_m')}) & {dd.H30_MASK}")
        )
    aggs = [
        F.min((F.lit(a).cast("long") * F.col("_h1") + F.lit(b)) % F.lit(MINHASH_P))
        .cast("long")
        .alias(f"m{i}")
        for i, (a, b) in enumerate(MINHASH_PERMS)
    ]
    return hashed.groupBy("doc_id").agg(*aggs)


@pytest.mark.parametrize("seed", [11, 22])
@pytest.mark.parametrize("algo", ["md5i64", "xxhash64"])
def test_minhash_signatures_match_explode_shape(spark, seed, algo):
    docs = _corpus(spark, seed)
    got = _rowset(dd.minhash_signatures(docs, "doc_id", "text", algo=algo))
    ref = _rowset(_ref_minhash_sigs(docs, algo))
    assert got == ref


@pytest.mark.parametrize("seed", [11, 22])
def test_jaccard_pairs_match_explode_shape(spark, seed):
    docs = _corpus(spark, seed)
    got = _rowset(dd.jaccard_pairs(docs, "doc_id", "text"))
    # reference verify: explode-join intersection over the old shingle frame
    cand = dd.minhash_pairs(docs, "doc_id", "text")
    words = _ref_shingles(docs)
    sizes = words.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    wa = words.select(F.col("doc_id").alias("doc_a"), "w")
    wb = words.select(F.col("doc_id").alias("doc_b"), "w")
    inter = (
        cand.join(wa, on="doc_a")
        .join(wb, on=["doc_b", "w"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("ninter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    ref = _rowset(
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
    assert got == ref


@pytest.mark.parametrize("seed", [11, 22])
@pytest.mark.parametrize("algo", ["md5i64", "xxhash64"])
def test_simhash_matches_explode_shape(spark, seed, algo):
    docs = _corpus(spark, seed)
    got = _rowset(dd.simhash(docs, "doc_id", "text", algo=algo))
    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
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
    ref = _rowset(
        hashed.groupBy("doc_id").agg(F.expr(f"CAST({bits} AS BIGINT)").alias("simhash"))
    )
    assert got == ref


@pytest.mark.parametrize("seed", [11, 22])
def test_fingerprint_matches_explode_shape(spark, seed):
    docs = _corpus(spark, seed)
    got = _rowset(tx.fingerprint(docs, "doc_id", "text"))
    hashed = _ref_shingles(docs).withColumn("_m", F.md5("w")).withColumn(
        "_h", F.expr(sqlgen.hexfold_i64("_m"))
    )
    ref = _rowset(
        hashed.groupBy("doc_id").agg(F.bit_xor("_h").cast("long").alias("fingerprint"))
    )
    assert got == ref


@pytest.mark.parametrize("seed", [11, 22])
def test_repetition_stats_match_explode_shape(spark, seed):
    docs = _corpus(spark, seed)
    got = _rowset(tx.repetition_stats(docs, "doc_id", "text"))
    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    word_stats = words.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"), F.count_distinct("w").alias("n_distinct")
    )
    ws = "split(text, ' ')"
    bigrams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size({ws}) < 2 THEN array() "
                f"ELSE transform(sequence(1, size({ws}) - 1), "
                f"i -> concat(element_at({ws}, i), ' ', element_at({ws}, i + 1))) END"
            )
        ).alias("bigram"),
    )
    top_bi = (
        bigrams.groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("doc_id")
        .agg(F.max("n").alias("max_bi"), F.sum("n").alias("n_bi"))
    )
    ref = _rowset(
        word_stats.join(top_bi, "doc_id", "left").select(
            "doc_id",
            F.expr(
                "CAST(ROUND(10000.0 * (n_words - n_distinct) / n_words) AS BIGINT)"
            ).alias("dup_word_frac_c"),
            F.coalesce(
                F.expr("CAST(ROUND(10000.0 * max_bi / n_bi) AS BIGINT)"), F.lit(0)
            ).alias("top_bigram_frac_c"),
        )
    )
    assert got == ref


def test_scale_out_widens_and_noops(spark):
    """An under-split frame is widened to defaultParallelism with a hash
    repartition; an already-wide frame passes through unchanged (so at
    cluster split counts the helper never inserts a shuffle)."""
    from tikv_data_compare_spark.session import scale_out

    target = spark.sparkContext.defaultParallelism
    narrow = spark.range(100).coalesce(1)
    assert narrow.rdd.getNumPartitions() == 1
    widened = scale_out(narrow, key="id")
    assert widened.rdd.getNumPartitions() == target
    wide = spark.range(100).repartition(target + 4, "id")
    assert scale_out(wide, key="id") is wide
    # r18: shuffle-shaped frames are returned UNCHANGED without touching
    # .rdd — under AQE the partition probe finalizes the adaptive plan and
    # EXECUTES every upstream shuffle stage as real jobs (measured on the
    # curation row: 15+ cpu-s per probe), so such frames are never probed;
    # their parallelism is already shuffle-partition/AQE-governed.
    a = spark.range(50).withColumnRenamed("id", "k")
    joined = a.join(spark.range(50).withColumnRenamed("id", "k"), "k")
    assert scale_out(joined, key="k") is joined
    agg = a.groupBy("k").count()
    assert scale_out(agg, key="k") is agg
    # plain round-robin repartition(n) shuffles too — not probed either
    rr = spark.range(100).repartition(2)
    assert scale_out(rr, key="id") is rr


def test_scale_out_streaming_noop(spark):
    """scale_out must pass streaming frames through untouched (.rdd is
    undefined for them) so text operators stay usable inside foreachBatch
    pipelines whose outer frame is a stream."""
    from tikv_data_compare_spark.session import scale_out

    stream = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    assert scale_out(stream, key="value") is stream


@pytest.mark.parametrize("seed", [11, 22])
def test_winnow_matches_window_shape(spark, seed):
    k, w = 5, 4
    docs = _corpus(spark, seed)
    got = _rowset(tx.winnow_fingerprints(docs, "doc_id", "text", k=k, w=w))
    grams = docs.select(
        "doc_id",
        F.expr("CAST(length(text) AS INT)").alias("_len"),
        F.posexplode(
            F.expr(
                f"transform(sequence(1, greatest(length(text) - {k} + 1, 1)), "
                f"i -> substr(text, i, {k}))"
            )
        ).alias("pos", "gram"),
    )
    hashed = grams.withColumn("_m", F.md5("gram")).withColumn(
        "h", F.expr(f"({sqlgen.hexfold_i64('_m')}) & {(1 << 30) - 1}")
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    n_grams = F.greatest(F.col("_len") - F.lit(k - 1), F.lit(1))
    ref = _rowset(
        hashed.withColumn("wmin", F.min("h").over(win))
        .filter((F.col("pos") <= n_grams - F.lit(w)) | (F.col("pos") == 0))
        .select("doc_id", F.col("wmin").alias("fp"))
        .distinct()
    )
    assert got == ref


# ---------------------------------------------------------------------------
# r8 determinism properties: partition-layout invariance of the new ops
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [3, 11])
def test_pack_and_shard_partition_invariance(spark, seed):
    """pack_token_bins and shard_assignments claim to be pure functions of
    content: re-laying the SAME rows out over a different partitioning
    must reproduce identical bins/positions bit-for-bit."""
    from tikv_data_compare_spark.operators.sampling import shard_assignments
    from tikv_data_compare_spark.operators.text import pack_token_bins

    docs = _corpus(spark, seed)
    redist = docs.repartition(7)
    for fn in (
        lambda d: pack_token_bins(d, budget=40, n_shards=4),
        lambda d: shard_assignments(d, 4, tiebreak_cols=["doc_id"]),
    ):
        a = sorted(tuple(r) for r in fn(docs).collect())
        b = sorted(tuple(r) for r in fn(redist).collect())
        assert a == b


def test_cohort_retention_partition_and_duplicate_invariance(spark):
    """The retention triangle counts DISTINCT users per (cohort, period):
    repartitioning must not change it, and duplicating an existing
    (user, day) activity row must not either."""
    from tikv_data_compare_spark.operators.events import cohort_retention

    rows = [
        (u, f"2024-01-{1 + (u * d) % 9:02d} 10:00:00")
        for u in range(1, 20)
        for d in range(1, 4)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").select(
        "user_id", F.to_timestamp("ts").alias("ts")
    )
    base = sorted(tuple(r) for r in cohort_retention(df).collect())
    assert base
    redist = sorted(tuple(r) for r in cohort_retention(df.repartition(5)).collect())
    assert redist == base
    duped = sorted(
        tuple(r) for r in cohort_retention(df.unionAll(df.limit(7))).collect()
    )
    assert duped == base


def test_profile_compare_swap_symmetry(spark):
    """Swapping src and dst mirrors the per-side columns and preserves the
    drift flags — no hidden asymmetry in the union/pivot machinery."""
    from tikv_data_compare_spark.model import Keyed
    from tikv_data_compare_spark.operators.diff import profile_compare

    a = spark.createDataFrame([(1, "x", 5), (2, None, 9)], "k long, s string, v long")
    b = spark.createDataFrame([(1, "x", 5), (2, "y", 7)], "k long, s string, v long")
    ab = {r["col_name"]: r for r in profile_compare(
        Keyed.of(a, keys=("k",)), Keyed.of(b, keys=("k",))).collect()}
    ba = {r["col_name"]: r for r in profile_compare(
        Keyed.of(b, keys=("k",)), Keyed.of(a, keys=("k",))).collect()}
    for c in ab:
        for stat in ("n_nulls", "n_distinct", "min_c", "max_c"):
            assert ab[c][f"src_{stat}"] == ba[c][f"dst_{stat}"]
            assert ab[c][f"dst_{stat}"] == ba[c][f"src_{stat}"]
        assert ab[c]["drifted"] == ba[c]["drifted"]


def test_range_bucket_col_monotone(spark):
    """Bucket ids are non-decreasing in the key — the property that makes a
    drifted bucket a CONTIGUOUS scannable range."""
    from tikv_data_compare_spark.operators.checksum import range_bucket_col

    df = spark.range(500).select((F.col("id") * 3 - 700).alias("k"))
    rows = sorted(
        (r["k"], r["b"])
        for r in df.withColumn(
            "b", range_bucket_col("k", [-500.0, -100.0, 0.0, 250.0, 900.0])
        ).collect()
    )
    buckets = [b for _, b in rows]
    assert buckets == sorted(buckets)
    # keys span [-700, 797): below the first boundary -> 0; above the 4th
    # (250) but below the 5th (900) -> 4
    assert buckets[0] == 0 and buckets[-1] == 4
