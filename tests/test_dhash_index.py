"""Persistent dHash band index: build/load roundtrip, cross-pair parity
with the batch self-join, append growth, and meta validation."""

import pytest
from pyspark.sql import functions as F

from tikv_data_compare_spark.operators import dhash_index as dhi
from tikv_data_compare_spark.operators.multimodal import dhash_pairs


def _hashes(spark):
    """Planted 64-bit hashes with known hamming structure: 1<->2 differ by
    2 bits, 3 is a near-dup of 1 (5 flips), 4 is far (complement), 5 is a
    NULL-hash (undecodable) row, 6 duplicates 2 exactly."""
    def i64(v):  # two's-complement wrap into BIGINT range
        v &= (1 << 64) - 1
        return v - (1 << 64) if v >= 1 << 63 else v

    base = 0x0123456789ABCDEF
    rows = [
        (1, base),
        (2, base ^ 0b101),
        (3, i64(base ^ ((1 << 63) | (1 << 40) | (1 << 22) | (1 << 9) | 1))),
        (4, i64(base ^ ((1 << 64) - 1))),
        (5, None),
        (6, base ^ 0b101),
    ]
    return spark.createDataFrame(rows, "doc_id long, dhash long")


def test_build_query_matches_batch_self_join(spark, tmp_path):
    """query(B vs index-of-A) == dhash_pairs(A ∪ B) restricted to cross
    pairs — the per-image-pure-function contract, at every max_hamming."""
    h = _hashes(spark)
    a = h.filter("doc_id <= 3")
    b = h.filter("doc_id > 3")
    p = str(tmp_path / "dhx")
    meta = dhi.build_dhash_index(a, p, n_bands=8)
    assert meta["n_docs"] == 3 and meta["slice_width"] == 8
    for mh in (2, 6, 64):
        got = sorted(
            (r["new_id"], r["indexed_id"], r["hamming"])
            for r in dhi.query_dhash_index(b, p, max_hamming=mh).collect()
        )
        a_ids = {1, 2, 3}
        want = sorted(
            (pair["doc_b"], pair["doc_a"], pair["hamming"])
            for pair in dhash_pairs(h, max_hamming=mh).collect()
            if pair["doc_a"] in a_ids and pair["doc_b"] not in a_ids
        )
        assert got == want
    # planted check at the pigeonhole-safe radius: 6 (== 2's hash, ham 0),
    # 6-vs-1 (ham 2), 6-vs-3 (flip sets {63,40,22,9,0}^{2,0} -> ham 5);
    # far row 4 (ham ~62) excluded; NULL row 5 never pairs
    got6 = {
        (r["new_id"], r["indexed_id"]): r["hamming"]
        for r in dhi.query_dhash_index(b, p, max_hamming=6).collect()
    }
    assert got6[(6, 2)] == 0 and got6[(6, 1)] == 2 and got6[(6, 3)] == 5
    assert not any(n == 4 or n == 5 for n, _ in got6)


def test_append_grows_index_exactly(spark, tmp_path):
    h = _hashes(spark)
    p = str(tmp_path / "dhxa")
    dhi.build_dhash_index(h.filter("doc_id <= 2"), p, n_bands=8)
    # appending includes a NULL-hash row: it must not index
    added = dhi.append_to_dhash_index(h.filter("doc_id IN (3, 5)"), p)
    assert added == 1
    idx = dhi.load_dhash_index(spark, p)
    assert idx.meta["n_docs"] == 3
    # post-append query sees the appended image
    got = {
        (r["new_id"], r["indexed_id"])
        for r in dhi.query_dhash_index(
            h.filter("doc_id = 6"), p, max_hamming=64
        ).collect()
    }
    assert got == {(6, 1), (6, 2), (6, 3)}
    # extra_meta rides the swap
    dhi.append_to_dhash_index(
        h.filter("doc_id = 4"), p, extra_meta={"last_epoch": 3}
    )
    assert dhi.load_dhash_index(spark, p).meta["last_epoch"] == 3


def test_geometry_comes_from_meta(spark, tmp_path):
    """A 4-band index bands its queries at 4 bands regardless of caller
    defaults — slice width differs from the 8-band default, so parity with
    the 4-band self-join proves the meta drove the banding."""
    h = _hashes(spark)
    p = str(tmp_path / "dhxg")
    dhi.build_dhash_index(h.filter("doc_id <= 3"), p, n_bands=4)
    got = sorted(
        (r["new_id"], r["indexed_id"], r["hamming"])
        for r in dhi.query_dhash_index(
            h.filter("doc_id > 3"), p, max_hamming=3
        ).collect()
    )
    a_ids = {1, 2, 3}
    want = sorted(
        (pair["doc_b"], pair["doc_a"], pair["hamming"])
        for pair in dhash_pairs(h, max_hamming=3, n_bands=4).collect()
        if pair["doc_a"] in a_ids and pair["doc_b"] not in a_ids
    )
    assert got == want


def test_load_validation(spark, tmp_path):
    h = _hashes(spark)
    p = str(tmp_path / "dhxv")
    with pytest.raises(ValueError, match="n_bands"):
        dhi.build_dhash_index(h, p, n_bands=0)
    dhi.build_dhash_index(h, p, n_bands=8)
    meta = spark.read.parquet(f"{p}/meta").collect()[0].asDict()
    # wrong version refuses
    bad = {**meta, "version": 99}
    dhi._write_meta(spark, p, bad)
    with pytest.raises(ValueError, match="version"):
        dhi.load_dhash_index(spark, p)
    # inconsistent geometry refuses
    bad = {**meta, "slice_width": 5}
    dhi._write_meta(spark, p, bad)
    with pytest.raises(ValueError, match="geometry"):
        dhi.load_dhash_index(spark, p)
