"""Tests for operators/clustering.py: bit-deterministic distributed k-means
and SemDeDup-style semantic dedup."""

from __future__ import annotations

import pytest


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_separates_planted_clusters(spark):
    from tikv_data_compare_spark.operators.clustering import kmeans

    rows = [(i, [10.0 + (i % 3) * 0.1, 0.0]) for i in range(10)]
    rows += [(100 + i, [-10.0 - (i % 3) * 0.1, 0.0]) for i in range(10)]
    assign, cents = kmeans(_emb(spark, rows), k=2, n_iter=2)
    got = {r["vec_id"]: r["cluster"] for r in assign.collect()}
    left = {got[i] for i in range(10)}
    right = {got[100 + i] for i in range(10)}
    assert len(left) == 1 and len(right) == 1 and left != right
    assert len(cents) == 2 and len(cents[0]) == 2


def test_kmeans_deterministic_across_runs(spark):
    from tikv_data_compare_spark.operators.clustering import kmeans

    rows = [(i, [float((i * 37) % 11) - 5, float((i * 17) % 7) - 3]) for i in range(40)]
    a1, c1 = kmeans(_emb(spark, rows), k=3, n_iter=3)
    a2, c2 = kmeans(_emb(spark, rows), k=3, n_iter=3)
    assert c1 == c2
    assert {r["vec_id"]: r["cluster"] for r in a1.collect()} == {
        r["vec_id"]: r["cluster"] for r in a2.collect()
    }


def test_kmeans_empty_cluster_keeps_seed_centroid(spark):
    """Identical seeds: every tie breaks to cluster 0, cluster 1 goes empty
    in round 1 and must retain its previous (seed) centroid — not NaN out
    or vanish.  (In later rounds that retained centroid may legitimately
    re-capture points; only the retention itself is asserted.)"""
    from tikv_data_compare_spark.operators.clustering import kmeans

    rows = [(0, [5.0, 5.0]), (1, [5.0, 5.0])] + [
        (10 + i, [5.0 + 0.01 * i, 5.0]) for i in range(8)
    ]
    assign, cents = kmeans(_emb(spark, rows), k=2, n_iter=1)
    # empty cluster 1 kept its (seed) centroid, in canon fixed-point units
    assert cents[1] == [500000.0, 500000.0]
    # cluster 0's centroid moved to the member mean — it had every point
    assert cents[0][0] > 500000.0
    assert len(assign.collect()) == 10


def test_kmeans_validates_args(spark):
    from tikv_data_compare_spark.operators.clustering import kmeans

    df = _emb(spark, [(0, [1.0]), (1, [2.0])])
    with pytest.raises(ValueError):
        kmeans(df, k=0)
    with pytest.raises(ValueError):
        kmeans(df, k=2, n_iter=0)
    with pytest.raises(ValueError):
        kmeans(df, k=5)  # k exceeds corpus


def test_semantic_dedup_drops_within_cluster_only(spark):
    """Near-identical vectors in the SAME cluster dedup to the lowest id;
    a near-identical pair SPLIT across clusters survives (the documented
    SemDeDup recall trade)."""
    from tikv_data_compare_spark.operators.clustering import semantic_dedup

    rows = [
        (0, [10.0, 0.0]),
        (1, [10.0, 0.1]),   # ~same direction as 0 -> dropped
        (2, [10.0, 0.2]),   # also ~same -> dropped
        (100, [-10.0, 0.0]),
        (101, [-10.0, 0.1]),  # ~same direction as 100 -> dropped
        (102, [-7.0, 7.0]),   # distinct direction -> kept
    ]
    out = {r["vec_id"]: r for r in semantic_dedup(
        _emb(spark, rows), k=2, n_iter=2, threshold_c=9990
    ).collect()}
    assert out[0]["kept"] == 1 and out[1]["kept"] == 0 and out[2]["kept"] == 0
    assert out[100]["kept"] == 1 and out[101]["kept"] == 0
    assert out[102]["kept"] == 1
    # verdicts cover every vector exactly once
    assert len(out) == 6


def test_semantic_dedup_threshold_monotone(spark):
    """Raising the threshold can only keep MORE vectors."""
    from tikv_data_compare_spark.operators.clustering import semantic_dedup

    rows = [(i, [float((i * 13) % 5) + 1, float((i * 7) % 3) + 1]) for i in range(30)]
    df = _emb(spark, rows)
    kept_lo = sum(r["kept"] for r in semantic_dedup(df, k=2, threshold_c=5000).collect())
    kept_hi = sum(r["kept"] for r in semantic_dedup(df, k=2, threshold_c=9999).collect())
    assert kept_lo <= kept_hi
    assert kept_hi >= 1
