"""Multimodal plumbing tests: metadata, Arrow-batched fake decode, stub gate."""

import pytest
from pyspark.sql import functions as F

from tikv_data_compare_spark.operators import multimodal as mm


def test_payload_meta_closed_form(spark):
    df = spark.createDataFrame([(1, "abcd"), (2, "é")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in mm.payload_meta(df).collect()}
    assert rows[1]["n_bytes"] == 4 and rows[1]["n_chunks"] == 1
    assert rows[2]["n_bytes"] == 2  # UTF-8 two bytes
    assert rows[1]["content_id"] is not None


def test_decode_features_fake_path(spark, documents):
    docs = documents.limit(10)
    feats = mm.decode_features(docs)
    rows = {r["doc_id"]: r for r in feats.collect()}
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(rows) == set(src)
    for did, r in rows.items():
        payload = src[did].encode()
        assert r["n_bytes"] == len(payload)
        assert r["decoded"] is True
        assert len(r["byte_histogram_head"]) == 4
        assert abs(r["byte_mean"] - (sum(payload) / len(payload))) < 1e-9


def test_decode_features_real_decode_raises(spark, documents):
    feats = mm.decode_features(documents.limit(2), real_decode=True)
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        feats.collect()


def test_frame_sample_offsets(spark):
    df = spark.createDataFrame([(1, "x" * 130)], "doc_id long, text string")
    rows = mm.frame_sample(df, every_n_bytes=64).collect()
    assert [(r["frame_idx"], r["byte_offset"]) for r in rows] == [(0, 0), (1, 64), (2, 128)]
