"""Range-scan / export tests: range semantics, global counter density, hex format."""

from pyspark.sql import functions as F

from tikv_data_compare_spark.model import Keyed
from tikv_data_compare_spark.operators.scan import export_hex, range_scan, with_global_index


def test_range_scan_half_open(kv_pair):
    src, _ = kv_pair
    keys = sorted(r["key"] for r in src.df.select("key").limit(100).collect())
    start, end = bytes(keys[10]), bytes(keys[20])
    got = [bytes(r["key"]) for r in range_scan(src, start, end).collect()]
    assert got == sorted(got)
    assert all(start <= k < end for k in got)
    assert bytes(keys[10]) in got and bytes(keys[20]) not in got  # [start, end)


def test_range_scan_unbounded(kv_pair):
    src, _ = kv_pair
    assert range_scan(src).count() == src.df.count()


def test_global_index_dense_and_ordered(spark, lineitem):
    df = lineitem.select("l_orderkey", "l_linenumber").distinct()
    n = df.count()
    idx = with_global_index(df, ["l_orderkey", "l_linenumber"])
    rows = idx.orderBy("cnt").collect()
    assert [r["cnt"] for r in rows] == list(range(1, n + 1))
    keys = [(r["l_orderkey"], r["l_linenumber"]) for r in rows]
    assert keys == sorted(keys)  # cnt order == key order


def test_export_hex_kv(tmp_path, kv_pair):
    src, _ = kv_pair
    small = Keyed(src.df.orderBy("key").limit(50))
    out = export_hex(small, path=str(tmp_path / "dump"))
    rows = out.collect()
    assert [r["cnt"] for r in rows] == list(range(1, 51))
    assert all(set(r["key_hex"]) <= set("0123456789ABCDEF") for r in rows)
    text = spark_read_lines(small.df.sparkSession, str(tmp_path / "dump"))
    assert len(text) == 50
    assert text[0].startswith("key:") and ", cnt:" in text[0]


def spark_read_lines(spark, path):
    return [r["value"] for r in spark.read.text(path).collect()]


def test_export_hex_typed(lineitem):
    k = Keyed.of(lineitem.limit(20), keys=("l_orderkey", "l_linenumber"))
    rows = export_hex(k).collect()
    assert len(rows) == 20
    assert all(r["cnt"] >= 1 for r in rows)


def test_global_index_precomputed_boundaries_no_jobs(spark, lineitem):
    """With caller-supplied boundaries, building the indexed plan runs ZERO
    Spark jobs (no count/sample pre-pass), and the index is identical to the
    sampled-boundary result."""
    df = lineitem.select("l_orderkey", "l_linenumber")
    sc = spark.sparkContext
    group = "wgi_boundaries_test"
    sc.setJobGroup(group, "plan construction must be job-free")
    try:
        out = with_global_index(df, ["l_orderkey", "l_linenumber"], boundaries=[(100, 1), (500, 1), (1000, 1)])
        jobs = sc.statusTracker().getJobIdsForGroup(group)
    finally:
        sc.setJobGroup(None, None)
    assert list(jobs) == [], f"plan construction ran jobs: {jobs}"
    got = sorted((r["l_orderkey"], r["l_linenumber"], r["cnt"]) for r in out.collect())
    ref = sorted(
        (r["l_orderkey"], r["l_linenumber"], r["cnt"])
        for r in with_global_index(df, ["l_orderkey", "l_linenumber"]).collect()
    )
    assert got == ref


def test_global_index_rejects_unsorted_boundaries(spark, lineitem):
    import pytest

    df = lineitem.select("l_orderkey")
    with pytest.raises(ValueError, match="ascending"):
        with_global_index(df, ["l_orderkey"], boundaries=[(3000,), (1000,)])


def test_parquet_footer_boundaries_drive_jobfree_index(spark):
    """Boundaries from parquet row-group stats (no Spark job, no data read)
    feed with_global_index and reproduce the sampled-boundary numbering."""
    from tikv_data_compare_spark.operators.scan import parquet_key_boundaries

    path = "/root/testdata/sf0.001/orders.parquet"
    bounds = parquet_key_boundaries(path, "o_orderkey")
    df = spark.read.parquet(path).select("o_orderkey")
    if bounds:  # stats present: strictly ascending, job-free construction
        assert all(a < b for a, b in zip(bounds, bounds[1:]))
        sc = spark.sparkContext
        sc.setJobGroup("footer_bounds", "")
        try:
            out = with_global_index(df, ["o_orderkey"], boundaries=bounds)
            assert list(sc.statusTracker().getJobIdsForGroup("footer_bounds")) == []
        finally:
            sc.setJobGroup(None, None)
    else:  # stats absent in this fixture: fall back to sampling
        out = with_global_index(df, ["o_orderkey"])
    got = sorted((r["o_orderkey"], r["cnt"]) for r in out.collect())
    ref = sorted(
        (r["o_orderkey"], r["cnt"]) for r in with_global_index(df, ["o_orderkey"]).collect()
    )
    assert got == ref


def test_empty_boundaries_fall_back_to_sampling(spark, lineitem):
    """boundaries=[] is exactly what parquet_key_boundaries returns when
    footer stats are absent — it must take the SAMPLING path (multi-bucket
    index), not silently collapse to one bucket."""
    from tikv_data_compare_spark.operators.scan import _range_bucket_expr, with_global_index

    df = lineitem.select("l_orderkey")
    sampled = _range_bucket_expr(df, ["l_orderkey"], 8, boundaries=None)
    empty = _range_bucket_expr(df, ["l_orderkey"], 8, boundaries=[])
    # both are the sampled CASE-chain, not the degenerate lit(0) bucket
    assert "CASE WHEN" in str(empty)
    assert str(empty) == str(sampled)
    got = sorted((r["l_orderkey"], r["cnt"]) for r in
                 with_global_index(df, ["l_orderkey"], boundaries=[]).collect())
    ref = sorted((r["l_orderkey"], r["cnt"]) for r in
                 with_global_index(df, ["l_orderkey"]).collect())
    assert got == ref


def test_export_hex_parquet_auto_boundaries_zero_prepass(spark):
    """A parquet-backed export with no explicit boundaries must take the
    footer-stat path by default: plan construction runs ZERO Spark jobs
    (one scan total), and the numbering matches the sampled path."""
    from tikv_data_compare_spark.model import Keyed
    from tikv_data_compare_spark.operators.scan import export_hex, parquet_key_boundaries

    path = "/root/testdata/sf0.001/orders.parquet"
    k = Keyed.of(spark.read.parquet(path), keys=("o_orderkey",))
    stats_present = bool(parquet_key_boundaries(path, "o_orderkey"))
    sc = spark.sparkContext
    sc.setJobGroup("auto_bounds_export", "")
    try:
        out = export_hex(k)
        if stats_present:
            assert list(sc.statusTracker().getJobIdsForGroup("auto_bounds_export")) == []
    finally:
        sc.setJobGroup(None, None)
    got = sorted((r["key_hex"], r["cnt"]) for r in out.collect())
    ref = sorted(
        (r["key_hex"], r["cnt"]) for r in export_hex(k, boundaries=[]).collect()
    )
    assert got == ref
