"""Persistent ANN index: build/load roundtrip, frozen-codebook append,
meta validation, and the build-once-query-many exactness contract."""

import pytest
from pyspark.sql import functions as F

from tikv_data_compare_spark.operators import ann_index as ai
from tikv_data_compare_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def emb(embeddings):
    return embeddings.cache()


def _qdf(emb, n):
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_index_roundtrip_exact_at_exhaustive(spark, emb, tmp_path_factory):
    """build -> load -> query (exhaustive probe + full rerank) must equal
    exact brute force — the persisted quantizers and codes reproduce the
    in-session path bit-for-bit."""
    path = str(tmp_path_factory.mktemp("annidx") / "idx")
    n = emb.count()
    meta = ai.build_ann_index(emb, path, n_cells=8, m=8, k_codes=16)
    assert meta["n_vectors"] == n and meta["dim"] == 64
    idx = ai.load_ann_index(spark, path)
    exact = sorted(
        (r["query_id"], r["neighbor_id"], r["rnk"])
        for r in sim.topk_bruteforce(emb, k=5, n_queries=6).collect()
    )
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["rnk"])
        for r in ai.topk_index(
            idx, _qdf(emb, 6), k=5, n_probe=8, rerank=n, emb_for_rerank=emb
        ).collect()
    )
    assert got == exact


def test_index_query_equals_fresh_join_path(spark, emb, tmp_path_factory):
    """Same seeds, same params: querying the SAVED index must return exactly
    what the fresh (train-in-session) join path returns, including ADC
    scores — persistence does not perturb the quantizers."""
    path = str(tmp_path_factory.mktemp("annidx") / "idx")
    ai.build_ann_index(emb, path, n_cells=8, m=8, k_codes=16, seed=7)
    idx = ai.load_ann_index(spark, path)
    fresh = sorted(
        tuple(r) for r in sim.topk_ivfpq_join(
            emb, _qdf(emb, 6), k=5, n_cells=8, n_probe=3, m=8, k_codes=16, seed=7
        ).collect()
    )
    saved = sorted(
        tuple(r) for r in ai.topk_index(idx, _qdf(emb, 6), k=5, n_probe=3).collect()
    )
    assert saved == fresh


def test_index_is_m_bytes_per_vector(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("annidx") / "idx")
    ai.build_ann_index(emb, path, n_cells=4, m=8, k_codes=16)
    rows = spark.read.parquet(f"{path}/vectors").limit(20).collect()
    assert rows and all(len(bytes(r["pq_code"])) == 8 for r in rows)
    assert set(rows[0].asDict()) == {"vec_id", "cell", "pq_code"}  # no floats


def test_append_with_frozen_codebooks(spark, emb, tmp_path_factory):
    """Build on half the corpus, append the other half: codes stay valid
    (existing rows unre-encoded), meta count updates, and exhaustive+rerank
    over the grown index equals brute force over the FULL corpus."""
    path = str(tmp_path_factory.mktemp("annidx") / "idx")
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)
    meta0 = ai.build_ann_index(half_a, path, n_cells=8, m=8, k_codes=16)
    n_added = ai.append_to_index(half_b, path)
    assert n_added == half_b.count()
    idx = ai.load_ann_index(spark, path)
    assert idx.meta["n_vectors"] == meta0["n_vectors"] + n_added
    n = emb.count()
    exact = sorted(
        (r["query_id"], r["neighbor_id"], r["rnk"])
        for r in sim.topk_bruteforce(emb, k=5, n_queries=6).collect()
    )
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["rnk"])
        for r in ai.topk_index(
            idx, _qdf(emb, 6), k=5, n_probe=8, rerank=n, emb_for_rerank=emb
        ).collect()
    )
    assert got == exact


def test_compact_equals_oneshot_and_bounds_files(spark, emb, tmp_path_factory):
    """N fragment-producing appends + compact ≡ a one-shot build: identical
    (vec_id, cell, pq_code) content, identical query results, file count
    bounded by target_files, n_compactions tracked in meta (VERDICT r12
    task 7)."""
    base = tmp_path_factory.mktemp("anncomp")
    p_inc, p_one = str(base / "inc"), str(base / "one")
    train = emb.filter(F.col("vec_id") % 4 == 0)
    ai.build_ann_index(train, p_inc, n_cells=8, m=8, k_codes=16)
    ai.build_ann_index(train, p_one, n_cells=8, m=8, k_codes=16)
    # many small appends -> many parquet fragments; one-shot side appends
    # the SAME rows in one pass (frozen codebooks -> identical codes)
    rest = emb.filter(F.col("vec_id") % 4 != 0)
    for j in range(1, 4):
        ai.append_to_index(rest.filter(F.col("vec_id") % 4 == j), p_inc)
    ai.append_to_index(rest, p_one)
    files_before = len(spark.read.parquet(f"{p_inc}/vectors").inputFiles())
    stats = ai.compact_index(spark, p_inc, target_files=2)
    assert stats["files_before"] == files_before
    assert stats["files_after"] <= 2 < files_before
    assert stats["n_compactions"] == 1
    # content: exact same code table as the one-shot build
    cols = ["vec_id", "cell", "pq_code"]
    inc_rows = sorted(
        (r["vec_id"], r["cell"], bytes(r["pq_code"]))
        for r in spark.read.parquet(f"{p_inc}/vectors").select(cols).collect()
    )
    one_rows = sorted(
        (r["vec_id"], r["cell"], bytes(r["pq_code"]))
        for r in spark.read.parquet(f"{p_one}/vectors").select(cols).collect()
    )
    assert inc_rows == one_rows and stats["n_vectors"] == len(one_rows)
    # queries: compacted index ≡ one-shot index, and append still works on
    # the compacted layout (meta self-heals counts from written files)
    q = _qdf(emb, 5)
    got_inc = sorted(
        (r["query_id"], r["neighbor_id"], r["rnk"])
        for r in ai.topk_index(
            ai.load_ann_index(spark, p_inc), q, k=3, n_probe=8,
            rerank=64, emb_for_rerank=emb,
        ).collect()
    )
    got_one = sorted(
        (r["query_id"], r["neighbor_id"], r["rnk"])
        for r in ai.topk_index(
            ai.load_ann_index(spark, p_one), q, k=3, n_probe=8,
            rerank=64, emb_for_rerank=emb,
        ).collect()
    )
    assert got_inc == got_one
    # second compaction increments the counter; validation guard fires
    assert ai.compact_index(spark, p_inc, target_files=1)["n_compactions"] == 2
    with pytest.raises(ValueError, match="target_files"):
        ai.compact_index(spark, p_inc, target_files=0)


def test_append_quantization_drift_gate(spark, emb, tmp_path_factory):
    """Frozen codebooks encode a shifted distribution silently worse — the
    gate must trip LOUD: fail before any write (default), warn-and-proceed
    on request, and stay silent for aligned appends and legacy indexes
    without the stored stats."""
    import warnings

    path = str(tmp_path_factory.mktemp("annidx") / "idx")
    ai.build_ann_index(emb, path, n_cells=4, m=8, k_codes=16)
    meta = spark.read.parquet(f"{path}/meta").collect()[0].asDict()
    assert len(meta["pq_mse"]) == 8 and all(v >= 0.0 for v in meta["pq_mse"])

    # a degenerate distribution far from the training data: every vector is
    # the first basis direction, which no codebook trained on the fixture
    # quantizes well
    shifted = emb.select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.expr(
            "transform(sequence(1, 64), i -> CASE WHEN i = 1 THEN 1.0D ELSE 0.0D END)"
        ).alias("embedding"),
    )
    n0 = ai.load_ann_index(spark, path).meta["n_vectors"]
    with pytest.raises(ValueError, match="drift"):
        ai.append_to_index(shifted, path)
    # fail rejected the append BEFORE any write
    assert ai.load_ann_index(spark, path).meta["n_vectors"] == n0

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        n_new = ai.append_to_index(shifted, path, on_drift="warn")
    assert n_new == emb.count()
    assert any("drift" in str(w.message) for w in caught)
    assert ai.load_ann_index(spark, path).meta["n_vectors"] == n0 + n_new

    with pytest.raises(ValueError, match="on_drift"):
        ai.append_to_index(shifted, path, on_drift="bogus")

    # a legacy index without stored stats is not gated
    legacy = str(tmp_path_factory.mktemp("annidx") / "legacy")
    ai.build_ann_index(emb, legacy, n_cells=4, m=8, k_codes=16)
    old_meta = spark.read.parquet(f"{legacy}/meta").collect()[0].asDict()
    old_meta.pop("pq_mse")
    spark.createDataFrame([tuple(old_meta.values())], list(old_meta.keys())).coalesce(
        1
    ).write.mode("overwrite").parquet(f"{legacy}/meta")
    assert ai.append_to_index(shifted, legacy) == emb.count()


def test_append_empty_batch_noops_and_skips_drift_gate(spark, emb, tmp_path_factory):
    """An empty append returns 0 without tripping the drift gate — pipelines
    legitimately append whatever a possibly-empty upstream filter yields
    (r9 ADVICE); only build_ann_index keeps the empty-frame error."""
    path = str(tmp_path_factory.mktemp("annidx") / "idx")
    ai.build_ann_index(emb, path, n_cells=4, m=8, k_codes=16)
    n0 = ai.load_ann_index(spark, path).meta["n_vectors"]
    empty = emb.filter(F.lit(False))
    assert ai.append_to_index(empty, path) == 0  # default on_drift='fail'
    assert ai.load_ann_index(spark, path).meta["n_vectors"] == n0


def test_index_validation_errors(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("annidx") / "idx")
    ai.build_ann_index(emb, path, n_cells=4, m=8, k_codes=16)
    # wrong-dim append is rejected before any write
    bad = spark.createDataFrame(
        [(10_000, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="dim"):
        ai.append_to_index(bad, path)
    # rerank without the float table is a loud error, not a silent ADC result
    idx = ai.load_ann_index(spark, path)
    with pytest.raises(ValueError, match="rerank"):
        ai.topk_index(idx, _qdf(emb, 3), k=3, n_probe=4, rerank=10).collect()
    # version gate
    meta = spark.read.parquet(f"{path}/meta").collect()[0].asDict()
    meta["version"] = 99
    spark.createDataFrame([tuple(meta.values())], list(meta.keys())).coalesce(
        1
    ).write.mode("overwrite").parquet(f"{path}/meta")
    with pytest.raises(ValueError, match="version"):
        ai.load_ann_index(spark, path)


# ---------------------------------------------------- streaming maintenance


def test_ann_index_stream_chunked_equals_oneshot(spark, emb, tmp_path):
    """Index maintained epoch-by-epoch from a stream (bootstrap build on
    epoch 0, frozen-codebook appends after) queried at exhaustive probe +
    full rerank must equal exact brute force over the WHOLE corpus — the
    rerank contract is unconditional on how the index was grown."""
    from tikv_data_compare_spark.streaming.ann_index_stream import (
        ann_index_stream,
    )

    src = str(tmp_path / "aixs_src")
    for m in range(3):
        emb.filter(F.col("vec_id") % 3 == m).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    idx_path = str(tmp_path / "aixs_idx")
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    query = ann_index_stream(
        stream, idx_path, checkpoint_location=str(tmp_path / "aixs_ckpt"),
        build_opts={"n_cells": 8, "m": 8, "k_codes": 16},
    )
    query.awaitTermination(180)
    idx = ai.load_ann_index(spark, idx_path)
    n = emb.count()
    assert idx.meta["n_vectors"] == n and idx.meta["last_epoch"] >= 1
    exact = sorted(
        (r["query_id"], r["neighbor_id"], r["rnk"])
        for r in sim.topk_bruteforce(emb, k=5, n_queries=6).collect()
    )
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["rnk"])
        for r in ai.topk_index(
            idx, _qdf(emb, 6), k=5, n_probe=8, rerank=n, emb_for_rerank=emb
        ).collect()
    )
    assert got == exact


def test_ann_index_ingest_redelivery_and_skip_idempotence(spark, emb, tmp_path):
    """Watermarked epochs skip wholesale; a half-committed epoch (vectors
    appended, meta swap lost) re-appends as a no-op via on_collision='skip'
    AND completes the lost watermark."""
    from tikv_data_compare_spark.streaming.ann_index_stream import (
        ingest_batch_into_ann_index,
    )

    idx_path = str(tmp_path / "aixr_idx")
    a = emb.filter(F.col("vec_id") % 2 == 0)
    b = emb.filter(F.col("vec_id") % 2 == 1)
    opts = {"n_cells": 8, "m": 8, "k_codes": 16}
    assert ingest_batch_into_ann_index(a, idx_path, epoch_id=0, build_opts=opts) is True
    assert ingest_batch_into_ann_index(b, idx_path, epoch_id=1) is True
    m1 = ai.load_ann_index(spark, idx_path).meta
    assert m1["n_vectors"] == emb.count() and m1["last_epoch"] == 1
    # watermark skip: same epoch again is a no-op
    assert ingest_batch_into_ann_index(b, idx_path, epoch_id=1) is False
    assert ai.load_ann_index(spark, idx_path).meta == m1
    # crash-window redelivery: vectors appended but watermark lost —
    # simulate by rolling the watermark back, then re-ingesting SAME batch
    ai._write_meta(spark, idx_path, {**m1, "last_epoch": 0})
    assert ingest_batch_into_ann_index(b, idx_path, epoch_id=1) is True
    m2 = ai.load_ann_index(spark, idx_path).meta
    # vectors NOT duplicated, watermark completed
    assert m2["n_vectors"] == m1["n_vectors"] and m2["last_epoch"] == 1
    n_rows = spark.read.parquet(f"{idx_path}/vectors").count()
    assert n_rows == emb.count()


def test_ann_index_stream_requires_checkpoint(spark, tmp_path):
    from tikv_data_compare_spark.streaming.ann_index_stream import (
        ann_index_stream,
    )

    stream = spark.readStream.schema(
        "vec_id long, embedding array<double>"
    ).parquet(str(tmp_path))
    with pytest.raises(ValueError, match="checkpoint_location"):
        ann_index_stream(stream, str(tmp_path / "i"))


def test_append_on_collision_modes(spark, emb, tmp_path):
    """'skip' appends only the genuinely-new vectors on overlap; 'fail'
    refuses loudly; bad mode is rejected."""
    idx_path = str(tmp_path / "aixc_idx")
    ai.build_ann_index(
        emb.filter(F.col("vec_id") < 100), idx_path, n_cells=8, m=8, k_codes=16
    )
    overlap = emb.filter((F.col("vec_id") >= 50) & (F.col("vec_id") < 150))
    n_new = overlap.filter(F.col("vec_id") >= 100).count()
    with pytest.raises(ValueError, match="on_collision"):
        ai.append_to_index(overlap, idx_path, on_collision="merge")
    with pytest.raises(ValueError, match="already exist"):
        ai.append_to_index(overlap, idx_path, on_collision="fail")
    assert ai.append_to_index(overlap, idx_path, on_collision="skip") == n_new
    meta = ai.load_ann_index(spark, idx_path).meta
    assert meta["n_vectors"] == 100 + n_new
    # all-duplicate batch: no-op append, but extra_meta still commits
    assert (
        ai.append_to_index(
            overlap, idx_path, on_collision="skip", extra_meta={"last_epoch": 7}
        )
        == 0
    )
    meta = ai.load_ann_index(spark, idx_path).meta
    assert meta["n_vectors"] == 100 + n_new and meta["last_epoch"] == 7
