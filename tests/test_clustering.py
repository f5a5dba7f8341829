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


def test_assign_broadcast_matches_literal_fixed_seeds(spark):
    """r10 verdict task 1: the broadcast-numpy assignment seam gives the
    SAME cluster ids as the centroid-literal SQL expression — full kmeans
    runs forced down each path agree on assignments AND centroids."""
    from tikv_data_compare_spark.operators.clustering import kmeans

    rows = [
        (i, [float((i * 37 + d * 13) % 23) - 11.0 for d in range(6)])
        for i in range(60)
    ]
    df = _emb(spark, rows)
    a_lit, c_lit = kmeans(df, k=5, n_iter=2, assign_mode="literal")
    a_bc, c_bc = kmeans(df, k=5, n_iter=2, assign_mode="broadcast")
    assert c_lit == c_bc
    assert {r["vec_id"]: r["cluster"] for r in a_lit.collect()} == {
        r["vec_id"]: r["cluster"] for r in a_bc.collect()
    }


def test_assign_auto_routes_on_kdim(spark):
    """auto == literal below the threshold (same plan text, centroid
    literals visible); above it the plan carries no centroid literals."""
    from tikv_data_compare_spark.operators.clustering import (
        ASSIGN_LITERAL_MAX_KDIM,
        _assign,
    )
    from pyspark.sql import functions as F

    vi = _emb(spark, [(i, [float(i), 0.0]) for i in range(4)]).select(
        F.col("vec_id").alias("_id"),
        F.expr("transform(embedding, x -> CAST(x AS BIGINT))").alias("_vi"),
    )
    small = [[1.0, 2.0], [3.0, 4.0]]
    plan_lit = _assign(vi, small, "auto")._jdf.queryExecution().toString()
    assert "aggregate(zip_with" in plan_lit  # literal fold in the plan
    dim = 2
    big_k = ASSIGN_LITERAL_MAX_KDIM // dim + 1
    big = [[float(j), float(j + 1)] for j in range(big_k)]
    plan_bc = _assign(vi, big, "auto")._jdf.queryExecution().toString()
    assert "aggregate(zip_with" not in plan_bc
    assert "mapinpandas" in plan_bc.lower()

    import pytest as _pytest

    with _pytest.raises(ValueError):
        _assign(vi, small, "bogus")


def test_semantic_dedup_broadcast_path_matches_literal(spark):
    """End-to-end SemDeDup parity across assignment paths."""
    from tikv_data_compare_spark.operators.clustering import semantic_dedup

    rows = [(i, [float((i * 13) % 5) + 1, float((i * 7) % 3) + 1]) for i in range(30)]
    df = _emb(spark, rows)
    lit = {r["vec_id"]: (r["cluster"], r["kept"]) for r in semantic_dedup(
        df, k=3, threshold_c=9000, assign_mode="literal"
    ).collect()}
    bc = {r["vec_id"]: (r["cluster"], r["kept"]) for r in semantic_dedup(
        df, k=3, threshold_c=9000, assign_mode="broadcast"
    ).collect()}
    assert lit == bc


def test_kmeans_k1024_broadcast_smoke(spark):
    """The SemDeDup-scale geometry the literal path cannot compile: k=1024
    centroids through the broadcast seam — every vector lands in a valid
    cluster and the run completes in one pass."""
    from tikv_data_compare_spark.operators.clustering import kmeans

    rows = [(i, [float((i * 31 + d * 7) % 97) for d in range(4)]) for i in range(2048)]
    assign, cents = kmeans(_emb(spark, rows), k=1024, n_iter=1, assign_mode="broadcast")
    got = assign.collect()
    assert len(got) == 2048
    assert all(0 <= r["cluster"] < 1024 for r in got)
    assert len(cents) == 1024


def test_semantic_dedup_auto_k_matches_explicit(spark, embeddings):
    """k='auto' resolves ceil(n / SEMDEDUP_CELL_TARGET) and produces the
    IDENTICAL verdict frame as the explicit k at that value (same seeds,
    same Lloyd algebra — 'auto' only picks the number)."""
    from tikv_data_compare_spark.operators import clustering as clu

    emb = embeddings.limit(250)
    n = emb.count()
    want_k = -(-n // clu.SEMDEDUP_CELL_TARGET)
    auto = {
        tuple(r) for r in clu.semantic_dedup(
            emb, k="auto", n_iter=2, threshold_c=3000
        ).collect()
    }
    explicit = {
        tuple(r) for r in clu.semantic_dedup(
            emb, k=want_k, n_iter=2, threshold_c=3000
        ).collect()
    }
    assert auto == explicit and len(auto) == n

    import pytest

    with pytest.raises(ValueError, match="int or 'auto'"):
        clu.semantic_dedup(emb, k="automatic")


def test_semantic_dedup_default_is_auto(spark, embeddings):
    """r17 (VERDICT r16 finding 1): the DEFAULT k is 'auto' — a naive
    semantic_dedup(emb) call gets the linear ceil(n/cell_target) geometry,
    not the fixed-k quadratic path.  Checked two ways: the signature
    default itself, and verdict-frame identity with an explicit
    k='auto' call on the same corpus."""
    import inspect

    from tikv_data_compare_spark.operators import clustering as clu

    assert inspect.signature(clu.semantic_dedup).parameters["k"].default == "auto"
    emb = embeddings.limit(120)
    default = {
        tuple(r)
        for r in clu.semantic_dedup(emb, n_iter=1, threshold_c=3000).collect()
    }
    auto = {
        tuple(r)
        for r in clu.semantic_dedup(emb, k="auto", n_iter=1, threshold_c=3000).collect()
    }
    assert default == auto and len(default) == 120


def test_assign_literal_threshold_keeps_gated_geometry_literal(spark):
    """The r16 re-calibration (16384 -> 4096): the gated k=64 x dim=64
    geometry must stay on the DuckDB-replayable literal path; anything
    larger routes to the broadcast seam (measured 136-157 s literal vs
    15-25 s broadcast at k=160 x 64 on sf1 — the interpreted fold, not
    the pair join, dominated)."""
    from tikv_data_compare_spark.operators import clustering as clu

    assert clu.ASSIGN_LITERAL_MAX_KDIM == 4096
    # 64x64 = 4096 -> literal (not strictly greater)
    assert not (64 * 64 > clu.ASSIGN_LITERAL_MAX_KDIM)
    # the sf1 regression case: 160x64 routes broadcast now
    assert 160 * 64 > clu.ASSIGN_LITERAL_MAX_KDIM
