"""Dedup operator tests: determinism, metamorphic duplicate detection, bounds."""

import pytest
from pyspark.sql import functions as F

from tikv_data_compare_spark.operators import dedup as dd


@pytest.fixture(scope="module")
def docs(documents):
    return documents.limit(60).cache()


def test_exact_groups_all_unique(docs):
    n = docs.count()
    groups = dd.exact_groups(docs, "doc_id", "text")
    assert groups.count() == n  # fixture has no exact dups
    assert groups.agg(F.sum("n_dups")).collect()[0][0] == n


def test_exact_dedup_finds_planted_dup(spark, docs):
    planted = docs.unionByName(
        docs.limit(3).withColumn("doc_id", F.col("doc_id") + 100000)
    )
    out = dd.dedup_exact(planted, "doc_id", "text")
    assert out.count() == docs.count()  # the 3 copies collapse
    # representatives are the min ids — none of the shifted ids survive
    assert out.filter(F.col("doc_id") >= 100000).count() == 0


def test_minhash_signature_deterministic(docs):
    a = dd.minhash_signatures(docs, "doc_id", "text").collect()
    b = dd.minhash_signatures(docs, "doc_id", "text").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a[0]) == 9  # doc_id + 8 perms


def test_minhash_identical_docs_pair(spark, docs):
    planted = docs.unionByName(docs.limit(1).withColumn("doc_id", F.lit(999999)))
    pairs = dd.minhash_pairs(planted, "doc_id", "text")
    first_id = docs.select(F.min("doc_id")).collect()[0][0]
    # identical text → identical signature → all bands match → pair found
    assert pairs.filter((F.col("doc_a") == first_id) & (F.col("doc_b") == 999999)).count() == 1


def test_minhash_pairs_canonical_order(docs):
    pairs = dd.minhash_pairs(docs, "doc_id", "text")
    assert pairs.filter(F.col("doc_a") >= F.col("doc_b")).count() == 0


def test_jaccard_bounds_and_identity(spark, docs):
    planted = docs.unionByName(docs.limit(1).withColumn("doc_id", F.lit(999999)))
    j = dd.jaccard_pairs(planted, "doc_id", "text").cache()
    assert j.filter((F.col("jaccard_c") < 0) | (F.col("jaccard_c") > 10000)).count() == 0
    first_id = docs.select(F.min("doc_id")).collect()[0][0]
    ident = j.filter((F.col("doc_a") == first_id) & (F.col("doc_b") == 999999)).collect()
    assert ident and ident[0]["jaccard_c"] == 10000  # identical word sets


def test_simhash_range_and_near_dup(spark, docs):
    sig = dd.simhash(docs, "doc_id", "text")
    bad = sig.filter((F.col("simhash") < 0) | (F.col("simhash") >= (1 << 32))).count()
    assert bad == 0
    planted = docs.unionByName(docs.limit(1).withColumn("doc_id", F.lit(999999)))
    pairs = dd.simhash_pairs(planted, "doc_id", "text")
    hit = pairs.filter(F.col("doc_b") == 999999).collect()
    # identical text → a distance-0 pair must exist; other docs may also be
    # within the hamming threshold, and collect order is plan-dependent
    assert hit and min(h["hamming"] for h in hit) == 0


@pytest.mark.parametrize("algo", ["md5i64", "xxhash64"])
def test_near_dup_operators_both_algos(spark, docs, algo):
    """The fast xxhash64 path (hash masking, simhash bit math on signed
    values) must find planted dups just like the oracle-checkable default."""
    planted = docs.unionByName(docs.limit(1).withColumn("doc_id", F.lit(999999)))
    first_id = docs.select(F.min("doc_id")).collect()[0][0]
    mh = dd.minhash_pairs(planted, "doc_id", "text", algo=algo)
    assert mh.filter((F.col("doc_a") == first_id) & (F.col("doc_b") == 999999)).count() == 1
    sh = dd.simhash_pairs(planted, "doc_id", "text", algo=algo)
    hit = sh.filter(F.col("doc_b") == 999999).collect()
    assert hit and min(h["hamming"] for h in hit) == 0
    sig = dd.simhash(planted, "doc_id", "text", algo=algo)
    assert sig.filter((F.col("simhash") < 0) | (F.col("simhash") >= (1 << 32))).count() == 0
    jc = dd.jaccard_pairs(planted, "doc_id", "text", algo=algo)
    ident = jc.filter((F.col("doc_a") == first_id) & (F.col("doc_b") == 999999)).collect()
    assert ident and ident[0]["jaccard_c"] == 10000


def test_unknown_algo_raises(docs):
    with pytest.raises(ValueError, match="unknown algo"):
        dd.minhash_pairs(docs, "doc_id", "text", algo="crc64")
    with pytest.raises(ValueError, match="unknown algo"):
        dd.simhash(docs, "doc_id", "text", algo="xxhash")


def test_jaccard_with_shared_shingles(spark, docs):
    """Passing a cached shingle_arrays frame yields identical results and
    a plan that reads the shingle arrays from cache (one tokenization per
    corpus, not one per pipeline stage)."""
    shingles = dd.shingle_arrays(docs, "doc_id", "text").cache()
    hashed = dd.hashed_shingle_arrays(docs, "doc_id", "text").cache()
    try:
        base = sorted(map(tuple, dd.jaccard_pairs(docs, "doc_id", "text").collect()))
        shared = dd.jaccard_pairs(docs, "doc_id", "text", shingles=shingles)
        assert sorted(map(tuple, shared.collect())) == base
        plan = shared._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan
        # the (shingles + hashes) cache variant: signature branches must skip
        # re-hashing (no md5 above the cache scan) and results are identical
        pre = dd.jaccard_pairs(docs, "doc_id", "text", shingles=hashed)
        assert sorted(map(tuple, pre.collect())) == base
    finally:
        shingles.unpersist()
        hashed.unpersist()


def test_connected_components_constructed_graph(spark):
    from tikv_data_compare_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10), (20, 21)],
        "doc_a long, doc_b long",
    )
    got = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_deep_chain(spark):
    """A path graph has maximal diameter — the propagation loop must walk
    it to the far end, exercising multiple checkpointed rounds."""
    from tikv_data_compare_spark.operators.graph import connected_components

    n = 30
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long"
    )
    got = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {i: 0 for i in range(n + 1)}


def test_connected_components_raises_past_max_iter(spark):
    import pytest

    from tikv_data_compare_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError):
        connected_components(edges, max_iter=2)


# ------------------------------------------------------------ line dedup


def _lines_map(df):
    return {r["doc_id"]: r for r in df.collect()}


def test_dedup_lines_first_occurrence_wins(spark):
    from tikv_data_compare_spark.operators.dedup import dedup_lines

    df = spark.createDataFrame(
        [
            (1, "unique one\nshared line\nalso unique"),
            (2, "shared line\nsecond body"),
            (3, "shared line"),
            (4, "unique one"),
        ],
        "doc_id long, text string",
    )
    got = _lines_map(dedup_lines(df))
    assert got[1]["new_text"] == "unique one\nshared line\nalso unique"
    assert (got[1]["n_lines"], got[1]["n_kept"], got[1]["n_dropped"]) == (3, 3, 0)
    # doc 2 loses the shared line but keeps its own body, order preserved
    assert got[2]["new_text"] == "second body"
    # docs 3 and 4 consist entirely of already-seen lines -> empty rebuild
    assert got[3]["new_text"] == "" and got[3]["n_kept"] == 0
    assert got[4]["new_text"] == "" and got[4]["n_dropped"] == 1


def test_dedup_lines_intra_doc_repeat(spark):
    """A line repeated INSIDE one document keeps only its first position."""
    from tikv_data_compare_spark.operators.dedup import dedup_lines

    df = spark.createDataFrame(
        [(7, "a\nb\na\nc\na")], "doc_id long, text string"
    )
    r = _lines_map(dedup_lines(df))[7]
    assert r["new_text"] == "a\nb\nc"
    assert (r["n_lines"], r["n_kept"], r["n_dropped"]) == (5, 3, 2)


def test_dedup_lines_custom_sep_is_literal(spark):
    """sep is a literal string, not a regex — '|' must not split per-char."""
    from tikv_data_compare_spark.operators.dedup import dedup_lines

    df = spark.createDataFrame(
        [(1, "x|y"), (2, "y|z")], "doc_id long, text string"
    )
    got = _lines_map(dedup_lines(df, sep="|"))
    assert got[1]["new_text"] == "x|y"
    assert got[2]["new_text"] == "z"


def test_dedup_lines_ordering_by_doc_then_pos(spark):
    """Global first occurrence orders by (doc_id, pos): the LOWER doc keeps
    the line even when the higher doc lists it at an earlier position."""
    from tikv_data_compare_spark.operators.dedup import dedup_lines

    df = spark.createDataFrame(
        [(10, "body\ntail line"), (11, "tail line\nown body")],
        "doc_id long, text string",
    )
    got = _lines_map(dedup_lines(df))
    assert got[10]["new_text"] == "body\ntail line"
    assert got[11]["new_text"] == "own body"


def test_dedup_lines_rejects_nothing_but_counts_align(spark):
    """n_kept + n_dropped == n_lines on every row; every input doc appears."""
    from tikv_data_compare_spark.operators.dedup import dedup_lines

    df = spark.createDataFrame(
        [(i, f"shared\nbody {i % 3}") for i in range(12)],
        "doc_id long, text string",
    )
    rows = dedup_lines(df).collect()
    assert len(rows) == 12
    assert all(r["n_kept"] + r["n_dropped"] == r["n_lines"] for r in rows)
    # 1 'shared' + 3 distinct bodies survive corpus-wide
    assert sum(r["n_kept"] for r in rows) == 4


def test_null_text_docs_never_pair_any_geometry(spark):
    """NULL/empty-text docs hash to NULL signatures and must never become
    candidate pairs — at the default geometry (scalar band keys: NULL
    never equi-joins) AND at parameterized geometries (array band keys
    compare NULL elements as EQUAL in Spark, so band_key_rows must drop
    NULL-bearing keys — r10 review)."""
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "real words here")],
        "doc_id long, text string",
    )
    assert dd.minhash_pairs(df, "doc_id", "text").collect() == []
    assert dd.minhash_pairs(
        df, "doc_id", "text", n_bands=3, rows_per_band=2
    ).collect() == []


def test_dedup_index_query_ignores_null_text(spark, tmp_path):
    """The review's repro: a NULL-text batch doc must not 'match' a
    NULL-text indexed doc through the array band keys."""
    from tikv_data_compare_spark.operators.dedup_index import (
        build_dedup_index,
        query_dedup_index,
    )

    corpus = spark.createDataFrame(
        [(1, None), (3, "x y z w")], "doc_id long, text string"
    )
    batch = spark.createDataFrame([(2, None)], "doc_id long, text string")
    p = str(tmp_path / "nullidx")
    build_dedup_index(corpus, p)
    assert query_dedup_index(batch, p).collect() == []


def test_dedup_lines_keeps_null_text_docs(spark):
    """One row per INPUT doc, as documented: a NULL-text doc reports zero
    lines and an empty rebuild instead of vanishing (r10 review)."""
    df = spark.createDataFrame(
        [(1, "a b c."), (2, None)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in dd.dedup_lines(df).collect()}
    assert set(rows) == {1, 2}
    assert rows[2]["n_lines"] == 0 and rows[2]["n_kept"] == 0
    assert rows[2]["new_text"] == ""
    assert rows[1]["n_kept"] == 1
