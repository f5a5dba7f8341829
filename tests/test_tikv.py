"""TiKV connector tests: region planning, the paginated scan protocol, and
the DataSource end-to-end over the in-memory fake client."""

import pytest

from tikv_data_compare_spark.sources.tikv import (
    DEFAULT_BATCH,
    FakeTikvClient,
    load_tikv,
    paginated_scan,
    plan_ranges,
)


def k(i: int) -> bytes:
    return i.to_bytes(8, "big")


# ---------------------------------------------------------------- planning


def test_plan_ranges_splits_at_region_boundaries():
    bounds = [k(100), k(200), k(300)]
    got = plan_ranges(bounds, k(50), k(250))
    assert got == [(k(50), k(100)), (k(100), k(200)), (k(200), k(250))]


def test_plan_ranges_unbounded_and_clamped():
    bounds = [k(100), k(200)]
    assert plan_ranges(bounds, None, None) == [
        (None, k(100)), (k(100), k(200)), (k(200), None),
    ]
    # range inside one region: no splits
    assert plan_ranges(bounds, k(110), k(120)) == [(k(110), k(120))]
    # empty range
    assert plan_ranges(bounds, k(150), k(150)) == []
    assert plan_ranges(bounds, k(200), k(100)) == []


# ------------------------------------------------------------- pagination


def test_paginated_scan_resumes_with_short_batches():
    client = FakeTikvClient(n=100, region_size=1000)
    pairs = list(paginated_scan(client, None, None, batch=7))
    assert len(pairs) == 100
    assert [p[0] for p in pairs] == [k(i) for i in range(100)]
    # half-open end respected across page boundaries
    pairs = list(paginated_scan(client, k(10), k(24), batch=5))
    assert [p[0] for p in pairs] == [k(i) for i in range(10, 24)]


# ----------------------------------------------------------- end-to-end


def test_datasource_reads_fake_cluster_region_aligned(spark):
    keyed = load_tikv(spark, client="fake", fake_n=500, fake_region_size=64)
    df = keyed.df
    assert df.columns == ["key", "value"]
    rows = df.collect()
    assert len(rows) == 500
    got = sorted(bytes(r["key"]) for r in rows)
    assert got == [k(i) for i in range(500)]
    # region-aligned parallelism: ceil(500/64) = 8 input partitions
    assert df.rdd.getNumPartitions() == 8


def test_datasource_range_pushdown(spark):
    keyed = load_tikv(
        spark, start=k(100), end=k(130), client="fake", fake_n=500, fake_region_size=64
    )
    got = sorted(bytes(r["key"]) for r in keyed.df.collect())
    assert got == [k(i) for i in range(100, 130)]


def test_datasource_small_batch_pagination(spark):
    keyed = load_tikv(spark, client="fake", fake_n=200, fake_region_size=500, batch=9)
    assert keyed.df.count() == 200


def test_api_version_handshake_rejects_mismatch(spark):
    keyed = load_tikv(
        spark, api_version="V2", client="fake", fake_n=10, fake_api_version="V1"
    )
    with pytest.raises(Exception, match="API version"):
        keyed.df.collect()


def test_live_client_fails_loudly(spark):
    keyed = load_tikv(spark, pd_addr="127.0.0.1:2379")
    with pytest.raises(Exception, match="tikv-client"):
        keyed.df.collect()


def test_default_batch_is_reference_page_size():
    assert DEFAULT_BATCH == 10240  # scan/scan.go:42


# ------------------------------------------------------------- properties


def test_plan_ranges_partition_property():
    """For random boundary sets and ranges: the planned sub-ranges tile
    [start, end) exactly — ordered, disjoint, gap-free, each within one
    region."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        bounds=st.lists(st.integers(0, 1000), max_size=20),
        lo=st.integers(0, 1000),
        hi=st.integers(0, 1000),
    )
    def check(bounds, lo, hi):
        bs = sorted({k(b) for b in bounds})
        start, end = k(min(lo, hi)), k(max(lo, hi))
        got = plan_ranges(bs, start, end)
        if start == end:
            assert got == []
            return
        # tiles exactly: first starts at start, last ends at end, adjacent
        assert got[0][0] == start and got[-1][1] == end
        for (a0, a1), (b0, b1) in zip(got, got[1:]):
            assert a1 == b0 and a0 < a1
        # every cut point is a region boundary strictly inside the range
        inner = {r[0] for r in got[1:]}
        assert inner == {b for b in bs if start < b < end}

    check()


def test_live_adapter_against_fake_tikv_client(monkeypatch):
    """The live adapter (sources/tikv_live.py) exercised against an injected
    fake of the public tikv_client API + patched PD HTTP endpoints: the
    3-method contract it produces must drive the SAME planning/pagination
    machinery the fake client does (driver-side unit — the DataSource e2e
    path is covered by the FakeTikvClient tests above)."""
    import json as _json
    import sys
    import types

    from tikv_data_compare_spark.sources import tikv_live

    store = {i.to_bytes(8, "big"): bytes([i % 251]) for i in range(300)}
    skeys = sorted(store)

    class _FakeRawClient:
        @classmethod
        def connect(cls, endpoints):
            assert endpoints == ["pd-a:2379", "pd-b:2379"]
            return cls()

        def scan(self, start, end, limit):
            out = []
            for kk in skeys:
                if kk < (start or b""):
                    continue
                if end is not None and kk >= end:
                    break
                out.append((kk, store[kk]))
                if len(out) >= limit:
                    break
            return out

    fake_mod = types.ModuleType("tikv_client")
    fake_mod.RawClient = _FakeRawClient
    monkeypatch.setitem(sys.modules, "tikv_client", fake_mod)

    def fake_http(url, timeout=10.0):
        if url.endswith("/pd/api/v1/config"):
            return b'{"storage": {"api-version": 2}}'
        if url.endswith("/pd/api/v1/regions"):
            regions = [{"start_key": ""}] + [
                {"start_key": (i).to_bytes(8, "big").hex()} for i in (100, 200)
            ]
            return _json.dumps({"regions": regions}).encode()
        raise AssertionError(f"unexpected PD url {url}")

    monkeypatch.setattr(tikv_live, "_http_get", fake_http)

    client = tikv_live.LiveTikvClient({"pd_addr": "pd-a:2379,pd-b:2379"})
    assert client.api_version() == "V2"
    bounds = client.region_boundaries()
    assert bounds == [(100).to_bytes(8, "big"), (200).to_bytes(8, "big")]

    # region planning over the live boundaries tiles the range
    ranges = plan_ranges(bounds, (50).to_bytes(8, "big"), (250).to_bytes(8, "big"))
    assert len(ranges) == 3
    # pagination through the live adapter reconstructs the store exactly,
    # page size forcing several lastKey+0x00 resumes
    got = list(paginated_scan(client, None, None, batch=64))
    assert got == [(kk, store[kk]) for kk in skeys]


def test_live_adapter_requires_pd_addr(monkeypatch):
    import sys
    import types

    from tikv_data_compare_spark.sources import tikv_live

    fake_mod = types.ModuleType("tikv_client")
    fake_mod.RawClient = object
    monkeypatch.setitem(sys.modules, "tikv_client", fake_mod)
    with pytest.raises(ValueError, match="pd_addr"):
        tikv_live.LiveTikvClient({})


def test_checksum_parallel_coprocessor_path(spark):
    """The region-parallel coprocessor checksum (checksum_parallel ≍
    reference GetChecksumParallel) must agree with the Spark-side crc64
    checksum over the SAME scanned range — the two independent paths the
    reference relies on agreeing (server coprocessor vs client merge), and
    the (XOR,+,+) monoid must make region-split == whole-range."""
    from tikv_data_compare_spark.model import Keyed
    from tikv_data_compare_spark.operators.checksum import checksum
    from tikv_data_compare_spark.sources.tikv import checksum_parallel

    client = FakeTikvClient(n=500, region_size=64)
    lo, hi = k(50), k(450)

    # region-split merge == one whole-range call (monoid law over regions)
    split = checksum_parallel(client, lo, hi, concurrency=4)
    whole = client.checksum(lo, hi)
    assert (split["checksum"], split["total_kvs"], split["total_bytes"]) == whole
    assert split["total_kvs"] == 400

    # coprocessor result == Spark-side crc64 over the scanned same range
    kv = load_tikv(spark, client="fake", start=lo, end=hi, fake_n=500, fake_region_size=64)
    row = checksum(Keyed(kv.df), algo="crc64").collect()[0]
    spark_crc = row["checksum"] & ((1 << 64) - 1)  # LongType is signed
    assert spark_crc == split["checksum"]
    assert row["total_kvs"] == split["total_kvs"]
    assert row["total_bytes"] == split["total_bytes"]


def test_checksum_parallel_unbounded_and_empty():
    from tikv_data_compare_spark.sources.tikv import checksum_parallel

    client = FakeTikvClient(n=100, region_size=30)
    full = checksum_parallel(client)
    assert full["total_kvs"] == 100
    empty = checksum_parallel(client, k(60), k(60))
    assert empty == {"checksum": 0, "total_kvs": 0, "total_bytes": 0}


def test_compare_checksum_parallel_verdicts():
    from tikv_data_compare_spark.sources.tikv import compare_checksum_parallel

    a = FakeTikvClient(n=300, region_size=64)
    b = FakeTikvClient(n=300, region_size=50)  # different REGIONS, same data
    v = compare_checksum_parallel(a, b, concurrency=4)
    assert v["equal"] and v["path"] == "coprocessor"
    # region layout must not affect the merged triple (monoid)
    assert v["src"] == {"side": "src", **{k2: v["dst"][k2] for k2 in ("checksum", "total_kvs", "total_bytes")}}

    c = FakeTikvClient(n=299, region_size=64)  # one pair missing
    v2 = compare_checksum_parallel(a, c)
    assert not v2["equal"]
    assert v2["src"]["total_kvs"] - v2["dst"]["total_kvs"] == 1

    # version gate before any checksum work (reference checksum.go:134-137)
    d = FakeTikvClient(n=300, api_version="V1")
    with pytest.raises(ValueError, match="API version"):
        compare_checksum_parallel(a, d)
