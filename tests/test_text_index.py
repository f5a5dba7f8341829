"""Tests for operators/text_index.py: the persistent BM25 index."""

from __future__ import annotations

import os

import pytest


DOCS = [
    (1, "spark filter join join window"),
    (2, "window scan filter"),
    (3, "join merge hash hash hash"),
    (4, "scan spark spark"),
    (5, "merge window window filter scan"),
    (6, "hash probe build side"),
]
QUERIES = [(0, "join hash"), (1, "window"), (2, "zz_unseen")]


def _frames(spark):
    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame(QUERIES, "query_id long, qtext string")
    return d, q


def test_index_query_equals_direct_bm25(spark, tmp_path):
    from tikv_data_compare_spark.operators.text import bm25_topk
    from tikv_data_compare_spark.operators.text_index import (
        build_text_index,
        query_text_index,
    )

    d, q = _frames(spark)
    p = os.path.join(tmp_path, "tix")
    meta = build_text_index(d, p)
    assert meta["n_docs"] == 6 and meta["sum_dl"] == sum(len(t.split()) for _, t in DOCS)
    got = sorted(map(tuple, query_text_index(q, p, k=3).collect()))
    want = sorted(map(tuple, bm25_topk(d, q, k=3).collect()))
    assert got == want and len(got) > 0


def test_append_grows_corpus_exactly(spark, tmp_path):
    """build(half) + append(half) must score IDENTICALLY to a whole-corpus
    one-shot — the exact-sufficient-statistics claim."""
    from tikv_data_compare_spark.operators.text import bm25_topk
    from tikv_data_compare_spark.operators.text_index import (
        append_to_text_index,
        build_text_index,
        query_text_index,
    )

    d, q = _frames(spark)
    p = os.path.join(tmp_path, "tix")
    build_text_index(d.filter("doc_id <= 3"), p)
    assert append_to_text_index(d.filter("doc_id > 3"), p) == 3
    got = sorted(map(tuple, query_text_index(q, p, k=5).collect()))
    want = sorted(map(tuple, bm25_topk(d, q, k=5).collect()))
    assert got == want


def test_compact_preserves_rankings_and_bounds_files(spark, tmp_path):
    """Appended fragments + compact: identical postings, identical BM25
    rankings (derived dfreq/meta refreshed from the rewritten table), file
    count bounded, watermark extras preserved."""
    from tikv_data_compare_spark.operators.text import bm25_topk
    from tikv_data_compare_spark.operators.text_index import (
        append_to_text_index,
        build_text_index,
        compact_text_index,
        load_text_index,
        query_text_index,
    )

    d, q = _frames(spark)
    p = os.path.join(tmp_path, "tixc")
    build_text_index(d.filter("doc_id <= 2"), p)
    append_to_text_index(d.filter("doc_id IN (3, 4)"), p)
    # the streaming face re-threads its watermark on every epoch; compact
    # must then PRESERVE whatever the last epoch committed
    append_to_text_index(d.filter("doc_id > 4"), p,
                         extra_meta={"last_epoch": 7})
    before_rows = sorted(
        map(tuple, spark.read.parquet(f"{p}/postings").collect())
    )
    stats = compact_text_index(spark, p, target_files=1)
    assert stats["files_after"] <= 1 < stats["files_before"]
    assert stats["n_compactions"] == 1
    assert sorted(
        map(tuple, spark.read.parquet(f"{p}/postings").collect())
    ) == before_rows
    meta = load_text_index(spark, p).meta
    assert meta["last_epoch"] == 7 and meta["n_docs"] == 6
    got = sorted(map(tuple, query_text_index(q, p, k=5).collect()))
    want = sorted(map(tuple, bm25_topk(d, q, k=5).collect()))
    assert got == want and got


def test_append_empty_batch_is_noop(spark, tmp_path):
    from tikv_data_compare_spark.operators.text_index import (
        append_to_text_index,
        build_text_index,
        load_text_index,
    )

    d, _ = _frames(spark)
    p = os.path.join(tmp_path, "tix")
    build_text_index(d, p)
    before = load_text_index(spark, p).meta
    assert append_to_text_index(d.filter("doc_id < 0"), p) == 0
    assert load_text_index(spark, p).meta == before


def test_load_validates_version_and_tokenizer(spark, tmp_path):
    from tikv_data_compare_spark.operators import text_index as ti

    d, _ = _frames(spark)
    p = os.path.join(tmp_path, "tix")
    ti.build_text_index(d, p)

    # corrupt version
    ti._write_meta(spark, p, {**ti.load_text_index(spark, p).meta, "version": 99})
    with pytest.raises(ValueError, match="format version"):
        ti.load_text_index(spark, p)
    # corrupt tokenizer
    ti._write_meta(
        spark,
        p,
        {
            "version": ti.TEXT_INDEX_FORMAT_VERSION,
            "tokenizer": "other-v9",
            "n_docs": 6,
            "sum_dl": 10,
        },
    )
    with pytest.raises(ValueError, match="tokenizer"):
        ti.load_text_index(spark, p)


def test_load_refuses_empty_index(spark, tmp_path):
    from tikv_data_compare_spark.operators import text_index as ti

    d, _ = _frames(spark)
    p = os.path.join(tmp_path, "tix")
    ti.build_text_index(d, p)
    ti._write_meta(
        spark,
        p,
        {
            "version": ti.TEXT_INDEX_FORMAT_VERSION,
            "tokenizer": ti.TOKENIZER,
            "n_docs": 0,
            "sum_dl": 0,
        },
    )
    with pytest.raises(ValueError, match="empty"):
        ti.load_text_index(spark, p)


def test_query_reads_no_text(spark, tmp_path):
    """The query plan touches only the index parquet — never the corpus
    text (the build-once/query-many point)."""
    from tikv_data_compare_spark.operators.text_index import (
        build_text_index,
        query_text_index,
    )

    d, q = _frames(spark)
    p = os.path.join(tmp_path, "tix")
    build_text_index(d, p)
    import re

    out = query_text_index(q, p, k=3)
    # inputFiles is never truncated (the plan string caps FileScan locations
    # at 100 chars, which a deep pytest tmp_path can overflow): every file
    # the plan reads is an index artifact, both index tables are read
    files = out.inputFiles()
    assert files and all("/tix/" in f for f in files)
    assert any("/postings/" in f for f in files)
    assert any("/dfreq/" in f for f in files)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the corpus `text` column never appears (qtext — the query string — does)
    assert not re.search(r"(?<!q)text#", plan)


def test_append_refuses_id_collisions(spark, tmp_path):
    """Re-appending indexed ids would double postings and flip idf negative
    for common terms — the append must refuse BEFORE writing anything."""
    from tikv_data_compare_spark.operators.text_index import (
        append_to_text_index,
        build_text_index,
        load_text_index,
        query_text_index,
    )

    d, q = _frames(spark)
    p = os.path.join(tmp_path, "tix")
    build_text_index(d, p)
    before = load_text_index(spark, p).meta
    with pytest.raises(ValueError, match="already exist"):
        append_to_text_index(d.filter("doc_id <= 2"), p)
    # nothing was written: meta unchanged, scores still positive
    assert load_text_index(spark, p).meta == before
    assert all(r["bm25_c"] > 0 for r in query_text_index(q, p, k=3).collect())


def test_index_scores_match_oneshot_with_null_text(spark, tmp_path):
    """NULL-text docs are corpus non-members in BOTH paths (the index
    derives stats from postings, where they cannot appear) — scores stay
    identical score-for-score (r10 review)."""
    import os

    from tikv_data_compare_spark.operators.text import bm25_topk
    from tikv_data_compare_spark.operators.text_index import (
        build_text_index,
        query_text_index,
    )

    d = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, None), (3, "beta beta delta")],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(0, "beta delta")], "query_id long, qtext string")
    p = os.path.join(tmp_path, "tix_null")
    build_text_index(d, p)
    direct = sorted(
        (r["query_id"], r["doc_id"], r["bm25_c"]) for r in bm25_topk(d, q, k=3).collect()
    )
    via_index = sorted(
        (r["query_id"], r["doc_id"], r["bm25_c"])
        for r in query_text_index(q, p, k=3).collect()
    )
    assert direct == via_index and direct


# ------------------------------------------------------------- streaming


def test_text_index_stream_chunked_equals_oneshot(spark, tmp_path):
    """Index maintained epoch-by-epoch from a stream scores IDENTICALLY to
    a one-shot whole-corpus build — the exact-statistics contract carried
    into continuous ingest."""
    from tikv_data_compare_spark.operators.text import bm25_topk
    from tikv_data_compare_spark.operators.text_index import query_text_index
    from tikv_data_compare_spark.streaming.text_index_stream import (
        text_index_stream,
    )

    d, q = _frames(spark)
    src = str(tmp_path / "tixs_src")
    for lo, hi in ((1, 3), (3, 5), (5, 7)):
        d.filter(f"doc_id >= {lo} AND doc_id < {hi}").coalesce(1).write.mode(
            "append"
        ).parquet(src)
    idx = str(tmp_path / "tixs_idx")
    stream = (
        spark.readStream.schema(d.schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    query = text_index_stream(
        stream, idx, checkpoint_location=str(tmp_path / "tixs_ckpt")
    )
    query.awaitTermination(180)
    got = sorted(map(tuple, query_text_index(q, idx, k=5).collect()))
    want = sorted(map(tuple, bm25_topk(d, q, k=5).collect()))
    assert got == want and got


def test_text_index_ingest_redelivery_and_skip_idempotence(spark, tmp_path):
    """Watermarked epochs skip wholesale; a half-committed epoch (postings
    appended, meta swap lost) re-appends as a no-op via on_collision='skip'
    AND completes the lost watermark."""
    from tikv_data_compare_spark.operators import text_index as ti
    from tikv_data_compare_spark.streaming.text_index_stream import (
        ingest_batch_into_text_index,
    )

    d, q = _frames(spark)
    idx = str(tmp_path / "tixr_idx")
    a, b = d.filter("doc_id <= 3"), d.filter("doc_id > 3")
    assert ingest_batch_into_text_index(a, idx, epoch_id=0) is True
    assert ingest_batch_into_text_index(b, idx, epoch_id=1) is True
    m1 = ti.load_text_index(spark, idx).meta
    # watermark skip: same epoch again is a no-op
    assert ingest_batch_into_text_index(b, idx, epoch_id=1) is False
    assert ti.load_text_index(spark, idx).meta == m1
    # crash-window redelivery: bands appended but watermark lost — simulate
    # by rolling the watermark back, then re-ingesting the SAME docs
    ti._write_meta(spark, idx, {**m1, "last_epoch": 0})
    assert ingest_batch_into_text_index(b, idx, epoch_id=1) is True
    m2 = ti.load_text_index(spark, idx).meta
    assert m2["n_docs"] == m1["n_docs"] and m2["sum_dl"] == m1["sum_dl"]
    assert m2["last_epoch"] == 1
    # and the postings were NOT duplicated (df would exceed n_docs)
    from tikv_data_compare_spark.operators.text_index import query_text_index

    assert all(r["bm25_c"] > 0 for r in query_text_index(q, idx, k=3).collect())


def test_text_index_stream_requires_checkpoint(spark, tmp_path):
    import pytest as _pytest

    from tikv_data_compare_spark.streaming.text_index_stream import (
        text_index_stream,
    )

    stream = spark.readStream.schema("doc_id long, text string").parquet(str(tmp_path))
    with _pytest.raises(ValueError, match="checkpoint_location"):
        text_index_stream(stream, str(tmp_path / "i"))


def test_append_on_collision_skip_appends_only_new(spark, tmp_path):
    """on_collision='skip': overlapping batch ids anti-join out; only the
    genuinely-new docs append, and stats stay exact."""
    from tikv_data_compare_spark.operators.text import bm25_topk
    from tikv_data_compare_spark.operators.text_index import (
        append_to_text_index,
        build_text_index,
        query_text_index,
    )

    d, q = _frames(spark)
    p = os.path.join(tmp_path, "tix_skip")
    build_text_index(d.filter("doc_id <= 4"), p)
    # batch overlaps ids 3,4 and adds 5,6
    added = append_to_text_index(d.filter("doc_id >= 3"), p, on_collision="skip")
    assert added == 2
    got = sorted(map(tuple, query_text_index(q, p, k=5).collect()))
    want = sorted(map(tuple, bm25_topk(d, q, k=5).collect()))
    assert got == want
    with pytest.raises(ValueError, match="on_collision"):
        append_to_text_index(d, p, on_collision="merge")


def test_streaming_ingest_all_null_epoch_commits_watermark(spark, tmp_path):
    """An epoch whose docs yield no postings (all-NULL text) must still
    advance last_epoch — otherwise a restart would redeliver it forever
    while the face reported it applied (r10 review)."""
    from tikv_data_compare_spark.operators import text_index as ti
    from tikv_data_compare_spark.streaming.text_index_stream import (
        ingest_batch_into_text_index,
    )

    d, _ = _frames(spark)
    idx = str(tmp_path / "tixw_idx")
    assert ingest_batch_into_text_index(d, idx, epoch_id=0) is True
    nulls = spark.createDataFrame([(100, None)], "doc_id long, text string")
    assert ingest_batch_into_text_index(nulls, idx, epoch_id=1) is True
    meta = ti.load_text_index(spark, idx).meta
    assert meta["last_epoch"] == 1 and meta["n_docs"] == 6
    # and the redelivery skip now fires
    assert ingest_batch_into_text_index(nulls, idx, epoch_id=1) is False
