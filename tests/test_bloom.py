"""Bloom membership gate: bit-exact brute-force parity, the no-false-
negative contract, the exact prefilter composition, and the persistent /
streaming index faces."""

import hashlib

import pytest
from pyspark.sql import functions as F

from tikv_data_compare_spark.operators import bloom as bl

M, K = 63 * 80, 4  # 5040 bits — small enough for brute force, real FPs


def _fold(s: str) -> int:
    h = hashlib.md5(s.encode()).hexdigest()
    v = 0
    for c in h[:15]:
        v = v * 16 + int(c, 16)
    return v


def _py_positions(item, m=M, k=K):
    key = item if item is not None else ""
    return [_fold(f"{key}:{j}") % m for j in range(k)]


def _py_bitmap(items, m=M, k=K):
    words = {}
    for it in items:
        for pos in _py_positions(it, m, k):
            w, b = pos // 63, pos % 63
            words[w] = words.get(w, 0) | (1 << b)
    return words


def _py_member(bitmap, item, m=M, k=K):
    return int(all(
        (bitmap.get(pos // 63, 0) >> (pos % 63)) & 1
        for pos in _py_positions(item, m, k)
    ))


_ADVERSARIAL = [
    "néédlé ü",              # multibyte UTF-8 (md5 runs over the bytes)
    "日本語テキスト",          # CJK
    "emoji 🚀🎉",             # astral-plane codepoints
    "with:colon:item",       # colons — must not collide with the :j coin
    "with:colon:item:0",     # ...nor with another item's probe-0 coin
    "tab\tand\nnewline",
]


def test_bloom_build_matches_brute_force(spark):
    items = [f"needle {i}" for i in range(120)] + [None, ""] + _ADVERSARIAL
    df = spark.createDataFrame([(s,) for s in items], "s string")
    got = {r["word"]: r["bits"] for r in bl.bloom_build(df, "s", M, K).collect()}
    assert got == _py_bitmap(items)


def test_bloom_probe_matches_brute_force_and_never_misses(spark):
    members = [f"needle {i}" for i in range(120)]
    df = spark.createDataFrame([(s,) for s in members], "s string")
    bitmap = bl.bloom_build(df, "s", M, K)
    py = _py_bitmap(members)
    probes = members + [f"hay {i}" for i in range(300)] + [None, ""] + _ADVERSARIAL
    pdf = spark.createDataFrame([(s,) for s in probes], "s string")
    got = {
        r["s"]: r["might_contain"]
        for r in bl.bloom_probe(pdf.distinct(), bitmap, "s", M, K).collect()
    }
    for s in probes:
        assert got[s] == _py_member(py, s), s
    # zero false negatives, by construction AND measured
    assert all(got[s] == 1 for s in members)
    # the false-positive rate at this geometry stays small but nonzero-able
    fps = sum(got[f"hay {i}"] for i in range(300))
    assert fps <= 15  # expected ~0.6% of 300; 5% is a loose determinism-safe cap


def test_bloom_prefilter_composition_is_exact(spark, documents):
    """bloom-probe the docs' winnow fingerprints against a filter of probe
    fingerprints: every TRULY shared fingerprint flags (so the downstream
    exact verify sees every candidate the fingerprint join would — the
    prune can only over-select, never lose a hit), every doc the EXACT
    decontaminator flags has at least one flagged fingerprint, and the
    false-positive overhang at a production-ish geometry is tiny."""
    from tikv_data_compare_spark.operators import text as tx

    m2 = 63 * 4096  # ~258k bits: the size you'd ship, still a ~2 MB table
    docs = documents.select("doc_id", "text")
    wprobes = documents.filter(F.col("doc_id") % 17 == 0).selectExpr(
        "doc_id AS probe_id", "substr(text, 6, 45) AS text"
    )
    p_fp = tx.winnow_fingerprints(wprobes, "probe_id", "text", k=5, w=20)
    bitmap = bl.bloom_build(p_fp.where(F.col("fp").isNotNull()), "fp", m2, K)
    d_fp = tx.winnow_fingerprints(docs, "doc_id", "text", k=5, w=20).where(
        F.col("fp").isNotNull()
    ).distinct()
    probed = bl.bloom_probe(d_fp, bitmap, "fp", m2, K,
                            id_cols=["doc_id", "fp"])
    flagged_pairs = {
        (r["doc_id"], r["fp"])
        for r in probed.where(F.col("might_contain") == 1).collect()
    }
    shared_pairs = {
        (r["doc_id"], r["fp"])
        for r in d_fp.join(
            p_fp.select("fp").where(F.col("fp").isNotNull()).distinct(), "fp"
        ).collect()
    }
    assert shared_pairs, "fixture must share winnow fingerprints"
    assert shared_pairs <= flagged_pairs  # zero false negatives
    n_probed = d_fp.count()
    overhang = len(flagged_pairs) - len(shared_pairs)
    assert overhang <= max(5, n_probed // 100)  # FP overhang under ~1%
    # end-to-end: every exactly-contaminated doc survives the prefilter
    hits = {d for d, _ in flagged_pairs}
    exact = tx.decontaminate_substring(docs, wprobes, min_span=24).collect()
    contaminated = [r["doc_id"] for r in exact if r["contaminated"]]
    assert contaminated, "fixture must plant contamination"
    assert set(contaminated) <= hits
    # doc-level fidelity: the bloom flags the same docs the exact
    # fingerprint join would, plus at most the pair-level FP overhang
    # (this fixture shares common 5-gram minima across most docs, so
    # doc-level PRUNING is a property of the fingerprints, not the bloom —
    # the bloom's contract is faithfulness to the fingerprint join at a
    # bounded bitmap size)
    shared_docs = {d for d, _ in shared_pairs}
    assert shared_docs <= hits and len(hits - shared_docs) <= overhang


def test_bloom_index_roundtrip_append_and_validation(spark, tmp_path):
    a = spark.createDataFrame([(f"a{i}",) for i in range(50)], "s string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(50)], "s string")
    p = str(tmp_path / "blix")
    meta = bl.build_bloom_index(a, p, "s", m_bits=M, k_hashes=K)
    assert meta["n_items"] == 50 and meta["m_bits"] == M
    probe = spark.createDataFrame([("a7",), ("b7",)], "s string")
    got = {r["s"]: r["might_contain"]
           for r in bl.query_bloom_index(probe, p, "s").collect()}
    assert got["a7"] == 1
    # b7 not yet inserted (could false-positive, but not at this geometry)
    assert got["b7"] == _py_member(_py_bitmap([f"a{i}" for i in range(50)]), "b7")
    meta2 = bl.append_to_bloom_index(b, p, "s")
    assert meta2["n_items"] == 100
    got2 = {r["s"]: r["might_contain"]
            for r in bl.query_bloom_index(probe, p, "s").collect()}
    assert got2 == {"a7": 1, "b7": 1}
    # the merged bitmap is exactly the one-shot union build
    words = {r["word"]: r["bits"]
             for r in spark.read.parquet(f"{p}/words").collect()}
    assert words == _py_bitmap([f"a{i}" for i in range(50)]
                               + [f"b{i}" for i in range(50)])
    # re-appending is a bitmap no-op (bit_or idempotence)
    bl.append_to_bloom_index(b, p, "s")
    words2 = {r["word"]: r["bits"]
              for r in spark.read.parquet(f"{p}/words").collect()}
    assert words2 == words
    # geometry/validation guards
    with pytest.raises(ValueError):
        bl.bloom_build(a, "s", m_bits=10, k_hashes=4)
    with pytest.raises(ValueError):
        bl.bloom_build(a, "s", m_bits=M, k_hashes=0)
    with pytest.raises(ValueError):
        bl.bloom_probe(a, bl.bloom_build(a, "s", M, K), "s", M, K,
                       id_cols=["nope"])
    with pytest.raises(ValueError):
        bl.bloom_probe(a.withColumn("might_contain", F.lit(1)),
                       bl.bloom_build(a, "s", M, K), "s", M, K)
    # the full per-probe temporary namespace is reserved, not just the
    # stage/flag columns (ADVICE r12): a pre-existing _bhit0/_bw1/... would
    # make the probe join ambiguous or silently corrupt the flag
    for clash in ("_bhit0", f"_bw{K - 1}", "_bpos1", "_bb0"):
        with pytest.raises(ValueError):
            bl.bloom_probe(a.withColumn(clash, F.lit(1)),
                           bl.bloom_build(a, "s", M, K), "s", M, K)
    # ...but a name OUTSIDE the probe range (j >= k_hashes) is allowed
    assert bl.bloom_probe(
        a.withColumn(f"_bhit{K}", F.lit(7)),
        bl.bloom_build(a, "s", M, K), "s", M, K,
    ).count() == a.count()
    bl._write_meta(spark, p, {**meta2, "version": 99})
    with pytest.raises(ValueError):
        bl.load_bloom_index(spark, p)


def test_bloom_stream_chunked_equals_oneshot(spark, tmp_path):
    from tikv_data_compare_spark.streaming.bloom_index_stream import (
        bloom_index_stream,
    )

    src = str(tmp_path / "bls_src")
    for lo, hi in ((0, 40), (40, 80)):
        spark.createDataFrame(
            [(f"x{i}",) for i in range(lo, hi)], "item string"
        ).coalesce(1).write.mode("append").parquet(src)
    idx = str(tmp_path / "bls_idx")
    stream = (
        spark.readStream.schema("item string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = bloom_index_stream(
        stream, idx, checkpoint_location=str(tmp_path / "bls_ckpt"),
        m_bits=M, k_hashes=K,
    )
    q.awaitTermination(120)
    _, meta = bl.load_bloom_index(spark, idx)
    assert meta["n_items"] == 80 and meta["last_epoch"] >= 1
    words = {r["word"]: r["bits"]
             for r in spark.read.parquet(f"{idx}/words").collect()}
    assert words == _py_bitmap([f"x{i}" for i in range(80)])
    # checkpoint required
    with pytest.raises(ValueError):
        bloom_index_stream(stream, idx)


def test_bloom_stream_watermark_and_redelivery(spark, tmp_path):
    from tikv_data_compare_spark.streaming.bloom_index_stream import (
        ingest_batch_into_bloom_index,
    )

    a = spark.createDataFrame([("x0",), ("x1",)], "item string")
    b = spark.createDataFrame([("y0",), ("y1",)], "item string")
    idx = str(tmp_path / "blw_idx")
    assert ingest_batch_into_bloom_index(a, idx, 0, m_bits=M, k_hashes=K)
    assert ingest_batch_into_bloom_index(b, idx, 1)
    _, m1 = bl.load_bloom_index(spark, idx)
    assert m1["n_items"] == 4 and m1["last_epoch"] == 1
    # watermark skip: an already-applied epoch is a wholesale no-op
    assert ingest_batch_into_bloom_index(b, idx, 1) is False
    # crash-window redelivery (words swapped, meta swap lost): the re-OR
    # leaves the bitmap bit-identical; only the additive counter moves
    words_before = {r["word"]: r["bits"]
                    for r in spark.read.parquet(f"{idx}/words").collect()}
    bl._write_meta(spark, idx, {**m1, "last_epoch": 0})
    assert ingest_batch_into_bloom_index(b, idx, 1) is True
    words_after = {r["word"]: r["bits"]
                   for r in spark.read.parquet(f"{idx}/words").collect()}
    assert words_after == words_before
    _, m2 = bl.load_bloom_index(spark, idx)
    assert m2["last_epoch"] == 1


def test_decontaminate_bloom_prefilter_equivalence(spark, documents):
    """decontaminate_substring(bloom_m_bits=...) returns EXACTLY the base
    path's rows at any bitmap size — zero false negatives plus the exact
    re-join make the prefilter invisible in the result, even at a tiny
    bitmap where most probes false-positive."""
    from tikv_data_compare_spark.operators import text as tx

    docs = documents.select("doc_id", "text")
    wprobes = documents.filter(F.col("doc_id") % 17 == 0).selectExpr(
        "doc_id AS probe_id", "substr(text, 6, 45) AS text"
    )
    key = lambda df: sorted(tuple(r) for r in df.collect())
    base = key(tx.decontaminate_substring(docs, wprobes, min_span=24))
    assert base == key(tx.decontaminate_substring(
        docs, wprobes, min_span=24, bloom_m_bits=63 * 80))
    # a deliberately saturated 63-bit filter: everything flags, result same
    assert base == key(tx.decontaminate_substring(
        docs, wprobes, min_span=24, bloom_m_bits=63, bloom_k_hashes=1))
    # r19 verdict_only composed with bloom mode AND the hot-fp rekey split
    # (max_fp_df=1): the collapsed hot gram join runs NON-broadcast here —
    # the verdict column must still match the base path's exactly
    vo = tx.decontaminate_substring(
        docs, wprobes, min_span=24, bloom_m_bits=63 * 80, max_fp_df=1,
        verdict_only=True,
    )
    assert sorted((r["doc_id"], r["contaminated"]) for r in vo.collect()) \
        == sorted((r[0], r[3]) for r in base)


def test_curate_decontam_bloom_passthrough_equivalence(spark, documents):
    """curate(decontam_bloom_m_bits=...) keeps exactly the same docs and
    reports the same funnel as the broadcast-table path."""
    from tikv_data_compare_spark.operators.curate import curate

    docs = documents.select("doc_id", "lang", "text", "source").limit(200)
    probes = documents.filter(F.col("doc_id") % 17 == 0).selectExpr(
        "doc_id AS probe_id", "substr(text, 6, 45) AS text"
    )
    with pytest.raises(ValueError):  # orphaned scale knob is loud
        curate(docs, probes=probes, decontam_bloom_m_bits=63 * 80)
    kept_a, attr_a = curate(docs, probes=probes, decontam_span=24)
    kept_b, attr_b = curate(
        docs, probes=probes, decontam_span=24, decontam_bloom_m_bits=63 * 80
    )
    ids = lambda df: sorted(r["doc_id"] for r in df.select("doc_id").collect())
    assert ids(kept_a) == ids(kept_b)
    rows = lambda df: sorted(tuple(r) for r in df.collect())
    assert rows(attr_a) == rows(attr_b)


def test_subtract_corpus_matches_brute_force(spark):
    """Exact-content subtraction == a pure-Python membership check on the
    coalesced content strings, incl. NULL/empty keys and duplicate rows on
    both sides; bloom mode identical at any geometry."""
    from tikv_data_compare_spark.operators.dedup import subtract_corpus

    a_rows = [(i, f"text {i % 12}") for i in range(30)] + [(98, None), (99, "")]
    b_rows = [(100 + i, f"text {i}") for i in range(6)] + [(200, None)]
    a = spark.createDataFrame(a_rows, "doc_id long, text string")
    b = spark.createDataFrame(b_rows, "doc_id long, text string")
    bset = {t if t is not None else "" for _, t in b_rows}
    want = {i: int((t if t is not None else "") in bset) for i, t in a_rows}

    got = {r["doc_id"]: r["in_other"]
           for r in subtract_corpus(a, b).collect()}
    assert got == want
    for m in (63, 63 * 80):  # saturated and realistic bitmaps: same result
        gb = {r["doc_id"]: r["in_other"]
              for r in subtract_corpus(a, b, bloom_m_bits=m).collect()}
        assert gb == want, m
    # other_content_col + reserved-column guards
    b2 = b.withColumnRenamed("text", "body")
    got2 = {r["doc_id"]: r["in_other"]
            for r in subtract_corpus(a, b2, other_content_col="body").collect()}
    assert got2 == want
    with pytest.raises(ValueError):
        subtract_corpus(a.withColumn("in_other", F.lit(1)), b)
    with pytest.raises(ValueError):
        subtract_corpus(a.withColumn("_sub_h", F.lit("x")), b)
    with pytest.raises(ValueError):
        subtract_corpus(a.withColumn("_sub_hit", F.lit(1)), b)
