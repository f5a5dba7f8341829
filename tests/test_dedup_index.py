"""Persistent dedup index: incremental near-dup ≡ batch self-join (cross
restriction), append flow, meta validation."""

import os

import pytest
from pyspark.sql import functions as F

from tikv_data_compare_spark.operators import dedup as dd
from tikv_data_compare_spark.operators import dedup_index as di


@pytest.fixture(scope="module")
def docs(documents):
    return documents.limit(60).cache()


def _cross_pairs_via_batch(full, pred):
    """minhash_pairs over the union, restricted to one-side-matching pairs
    — the ground truth the index path must reproduce."""
    pairs = dd.minhash_pairs(full, "doc_id", "text")
    return {
        (r["doc_a"], r["doc_b"])
        for r in pairs.collect()
        if pred(r["doc_a"]) != pred(r["doc_b"])
    }


def _norm(cross_rows):
    return {
        (min(r["new_id"], r["indexed_id"]), max(r["new_id"], r["indexed_id"]))
        for r in cross_rows
    }


def test_query_equals_batch_cross_restriction(spark, docs, tmp_path):
    """Index(A) queried with B ≡ minhash_pairs(A ∪ B) restricted to cross
    pairs — signatures are per-doc pure functions, so the incremental path
    must lose/invent nothing.  A planted duplicate guarantees the candidate
    set is non-empty."""
    planted = docs.unionByName(
        docs.limit(2).withColumn("doc_id", F.col("doc_id") + 100000)
    ).cache()
    corpus = planted.filter(F.col("doc_id") < 100000)
    batch = planted.filter(F.col("doc_id") >= 100000)
    path = os.path.join(str(tmp_path), "idx")
    meta = di.build_dedup_index(corpus, path)
    assert meta["n_docs"] == corpus.count()
    got = _norm(di.query_dedup_index(batch, path).collect())
    want = _cross_pairs_via_batch(planted, lambda d: d >= 100000)
    assert got == want and got  # non-empty by construction


def test_append_extends_the_corpus(spark, docs, tmp_path):
    """After append(B), a later batch C pairs against A AND B."""
    a = docs.filter(F.col("doc_id") % 3 == 1)
    b = docs.filter(F.col("doc_id") % 3 == 2)
    # c duplicates one a-doc and one b-doc under fresh ids
    c = (
        a.orderBy("doc_id").limit(1).withColumn("doc_id", F.lit(777001))
        .unionByName(b.orderBy("doc_id").limit(1).withColumn("doc_id", F.lit(777002)))
    )
    path = os.path.join(str(tmp_path), "idx")
    di.build_dedup_index(a, path)
    before = _norm(di.query_dedup_index(c, path).collect())
    n_new = di.append_to_dedup_index(b, path)
    assert n_new == b.count()
    assert di.load_dedup_index(spark, path).meta["n_docs"] == a.count() + b.count()
    after = _norm(di.query_dedup_index(c, path).collect())
    # the a-duplicate is found both times; the b-duplicate only after append
    assert before < after
    b_first = b.select(F.min("doc_id")).collect()[0][0]
    assert any(b_first in p for p in after)
    assert not any(b_first in p for p in before)


def test_compact_preserves_results_and_bounds_files(spark, docs, tmp_path):
    """N appends + compact: identical band rows and query results, file
    count bounded, n_compactions in meta (the ANN compact contract on the
    dedup index)."""
    a = docs.filter(F.col("doc_id") % 3 == 1)
    path = os.path.join(str(tmp_path), "idx")
    di.build_dedup_index(a, path)
    for j in (0, 2):
        di.append_to_dedup_index(docs.filter(F.col("doc_id") % 3 == j), path)
    c = a.orderBy("doc_id").limit(2).withColumn(
        "doc_id", F.col("doc_id") + 900000
    )
    before_rows = sorted(
        map(tuple, spark.read.parquet(f"{path}/bands").collect())
    )
    before_q = _norm(di.query_dedup_index(c, path).collect())
    stats = di.compact_dedup_index(spark, path, target_files=2)
    assert stats["files_after"] <= 2 < stats["files_before"]
    assert stats["n_compactions"] == 1
    assert sorted(
        map(tuple, spark.read.parquet(f"{path}/bands").collect())
    ) == before_rows
    assert _norm(di.query_dedup_index(c, path).collect()) == before_q
    assert before_q  # planted duplicates guarantee non-vacuous
    # append still works on the compacted layout
    assert di.append_to_dedup_index(c, path) == 2
    assert di.compact_dedup_index(spark, path, target_files=1)[
        "n_compactions"
    ] == 2


def test_same_id_never_self_pairs(spark, docs, tmp_path):
    """Re-querying a doc already in the index (same id) yields no self
    pair; a distinct id with identical text verifies at jaccard 10000."""
    path = os.path.join(str(tmp_path), "idx")
    di.build_dedup_index(docs, path)
    one = docs.orderBy("doc_id").limit(1)
    assert di.query_dedup_index(one, path).filter(
        F.col("new_id") == F.col("indexed_id")
    ).count() == 0
    clone = one.withColumn("doc_id", F.lit(888888))
    cross = di.query_dedup_index(clone, path)
    pairs = cross.select(
        F.least("new_id", "indexed_id").alias("doc_a"),
        F.greatest("new_id", "indexed_id").alias("doc_b"),
    )
    full = docs.unionByName(clone)
    verified = dd.jaccard_for_pairs(pairs, full, "doc_id", "text")
    first_id = docs.select(F.min("doc_id")).collect()[0][0]
    hit = verified.filter(
        (F.col("doc_a") == first_id) & (F.col("doc_b") == 888888)
    ).collect()
    assert hit and hit[0]["jaccard_c"] == 10000


def test_build_is_deterministic(spark, docs, tmp_path):
    p1 = os.path.join(str(tmp_path), "i1")
    p2 = os.path.join(str(tmp_path), "i2")
    di.build_dedup_index(docs, p1)
    di.build_dedup_index(docs, p2)
    rows = lambda p: sorted(  # noqa: E731
        map(tuple, di.load_dedup_index(spark, p).bands.collect())
    )
    assert rows(p1) == rows(p2)


def test_meta_validation(spark, docs, tmp_path):
    path = os.path.join(str(tmp_path), "idx")
    di.build_dedup_index(docs, path)
    idx = di.load_dedup_index(spark, path)
    assert idx.meta["algo"] == "md5i64" and idx.meta["n_bands"] == 4
    # corrupt the version -> load refuses
    bad = {**idx.meta, "version": 99}
    di._write_meta(spark, path, bad)
    with pytest.raises(ValueError, match="format version"):
        di.load_dedup_index(spark, path)
    # inconsistent geometry (n_perms != bands*rows) -> load refuses
    di._write_meta(spark, path, {**idx.meta, "n_perms": 7})
    with pytest.raises(ValueError, match="inconsistent band geometry"):
        di.load_dedup_index(spark, path)


def test_non_default_geometry_build_query_append(spark, docs, tmp_path):
    """r10: geometry is a build parameter.  A 3×4 index (12 perms — forces
    the deterministic permutation extension past the 8 frozen constants)
    must store its geometry in the meta, band every later pass from the
    meta, and reproduce the batch self-join at the SAME geometry."""
    planted = docs.unionByName(
        docs.limit(2).withColumn("doc_id", F.col("doc_id") + 100000)
    ).cache()
    corpus = planted.filter(F.col("doc_id") < 100000)
    batch = planted.filter(F.col("doc_id") >= 100000)
    path = os.path.join(str(tmp_path), "idx34")
    meta = di.build_dedup_index(corpus, path, n_bands=3, rows_per_band=4)
    assert (meta["n_bands"], meta["rows_per_band"], meta["n_perms"]) == (3, 4, 12)
    got = _norm(di.query_dedup_index(batch, path).collect())
    # ground truth: the batch self-join at the index's OWN geometry
    pairs = dd.minhash_pairs(planted, "doc_id", "text", n_bands=3, rows_per_band=4)
    want = {
        (r["doc_a"], r["doc_b"])
        for r in pairs.collect()
        if (r["doc_a"] >= 100000) != (r["doc_b"] >= 100000)
    }
    assert got == want and got  # planted exact dup guarantees non-empty
    # a stricter geometry (rows_per_band 4, threshold ~0.76) is a subset of
    # the default wide-recall 4x2 candidates
    loose = _cross_pairs_via_batch(planted, lambda d: d >= 100000)
    assert got <= loose
    # append derives the geometry from the meta — no geometry args needed
    n = di.append_to_dedup_index(batch, path)
    assert n == batch.count()
    idx = di.load_dedup_index(spark, path)
    assert idx.meta["n_docs"] == planted.count()
    assert idx.bands.select("band").distinct().count() == 3
    assert idx.bands.select(F.size("hkey")).distinct().collect()[0][0] == 4


def test_minhash_perms_deterministic_extension(spark):
    """Beyond the 8 frozen constants the permutation sequence must be
    deterministic (an index built today is queried by a later session) and
    prefix-stable (narrowing n_perms never changes earlier perms)."""
    p12 = dd.minhash_perms(12)
    assert p12[:8] == dd.minhash_perms(8) == dd.minhash_perms(12)[:8]
    assert p12 == dd.minhash_perms(12)
    assert len(set(p12)) == 12  # no accidental repeats
    from tikv_data_compare_spark.queries import MINHASH_P

    assert all(0 < a < MINHASH_P and 0 <= b < MINHASH_P for a, b in p12)


def test_jaccard_for_pairs_matches_composed_path(docs):
    """The decoupled verify reproduces jaccard_pairs exactly when fed the
    same candidates."""
    composed = {
        (r["doc_a"], r["doc_b"]): r["jaccard_c"]
        for r in dd.jaccard_pairs(docs, "doc_id", "text").collect()
    }
    cand = dd.minhash_pairs(docs, "doc_id", "text")
    split = {
        (r["doc_a"], r["doc_b"]): r["jaccard_c"]
        for r in dd.jaccard_for_pairs(cand, docs, "doc_id", "text").collect()
    }
    assert composed == split
