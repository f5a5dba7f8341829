"""Checksum operator tests: monoid laws, equal/mutated verdicts, crc64 vectors."""

from pyspark.sql import functions as F

from tikv_data_compare_spark.functions.hashes import crc64_xz
from tikv_data_compare_spark.model import Keyed
from tikv_data_compare_spark.operators.checksum import checksum, checksum_verdict, compare_checksum


def test_crc64_check_value():
    # published CRC-64/XZ check value
    assert crc64_xz(b"123456789") == 0x995DC9BBDF1939FA
    assert crc64_xz(b"") == 0


def test_checksum_equal_on_identical(kv_pair):
    src, _ = kv_pair
    v = checksum_verdict(src, src)
    assert v["equal"]
    assert v["src"]["total_kvs"] > 0


def test_checksum_detects_mutation(kv_pair):
    src, dst = kv_pair
    v = checksum_verdict(src, dst)
    assert not v["equal"]
    assert v["src"]["total_kvs"] > v["dst"]["total_kvs"]  # dst had deletions


def test_checksum_monoid_split_merge(spark, kv_pair):
    """checksum(A ∪ B) == merge(checksum(A), checksum(B)) — the per-region
    merge law the reference relies on (checksum/checksum.go:25-29)."""
    src, _ = kv_pair
    mid = bytes(sorted(r["key"] for r in src.df.select("key").limit(2000).collect())[1000])
    lo = Keyed(src.df.filter(F.col("key") < F.lit(mid)))
    hi = Keyed(src.df.filter(F.col("key") >= F.lit(mid)))
    whole = checksum(src).collect()[0]
    a = checksum(lo).collect()[0]
    b = checksum(hi).collect()[0]
    assert a["total_kvs"] + b["total_kvs"] == whole["total_kvs"]
    assert a["total_bytes"] + b["total_bytes"] == whole["total_bytes"]
    assert (a["checksum"] or 0) ^ (b["checksum"] or 0) == whole["checksum"]


def test_checksum_order_independent(kv_pair):
    src, _ = kv_pair
    shuffled = Keyed(src.df.orderBy(F.rand(seed=7)))
    assert checksum(src).collect() == checksum(shuffled).collect()


def test_checksum_algos_agree_on_verdict(kv_pair):
    src, dst = kv_pair
    small_src = Keyed(src.df.limit(500))
    small_dst = Keyed(dst.df.limit(500))
    for algo in ("xxhash64", "md5i64", "crc64"):
        assert checksum_verdict(small_src, small_src, algo=algo)["equal"], algo
    assert not checksum_verdict(src, dst, "xxhash64")["equal"]


def test_checksum_crc64_on_typed_columns(lineitem):
    """crc64 must run on typed (non-binary) tables — the CLI advertises
    ``--algo crc64`` on any parquet.  Regression: the coalesce-then-cast
    ordering raised DATATYPE_MISMATCH on bigint columns."""
    from tikv_data_compare_spark.model import unique_by_key

    typed = Keyed.of(
        unique_by_key(lineitem, ["l_orderkey", "l_linenumber"]).limit(300),
        keys=("l_orderkey", "l_linenumber"),
    )
    row = checksum(typed, algo="crc64").collect()[0]
    assert row["total_kvs"] == 300
    assert row["checksum"] is not None
    # and the verdict path (src==src) is green end-to-end
    assert checksum_verdict(typed, typed, algo="crc64")["equal"]


def test_checksum_crc64_null_handling(spark):
    """NULL typed values hash like empty bytes (coalesce after the cast)."""
    df = spark.createDataFrame(
        [(1, "a"), (2, None)], "k bigint, v string"
    )
    rows = checksum(Keyed.of(df, keys=("k",)), algo="crc64").collect()
    assert rows[0]["total_kvs"] == 2


def test_checksum_xxhash64_null_column_shift(spark):
    """Regression (r7, ADVICE): Spark's xxhash64 skips NULL children, so
    (k, v, NULL) vs (k, NULL, v) — a classic column-shift bug — hashed
    identically and the verdict passed.  The null-safe children (interleaved
    isNull markers) must make the verdict fail."""
    src = spark.createDataFrame([(1, "x", None), (2, "a", "b")], "k bigint, v1 string, v2 string")
    dst = spark.createDataFrame([(1, None, "x"), (2, "a", "b")], "k bigint, v1 string, v2 string")
    ks = Keyed.of(src, keys=("k",))
    kd = Keyed.of(dst, keys=("k",))
    assert not checksum_verdict(ks, kd, algo="xxhash64")["equal"]
    # sanity: identical frames (with NULLs present) still verdict equal
    assert checksum_verdict(ks, ks, algo="xxhash64")["equal"]


def test_targeted_diff_xxhash64_null_column_shift(spark):
    """The same false-negative class through targeted_diff's default bucket
    hash: the drifted bucket's triple must mismatch so the row-level join
    sees the column-shifted row — findings identical to plain diff."""
    from pyspark.sql import functions as F

    from tikv_data_compare_spark.operators.diff import diff, targeted_diff

    rows_src = [(i, "x" if i == 7 else f"a{i}", None if i == 7 else f"b{i}") for i in range(100)]
    rows_dst = [(i, None if i == 7 else f"a{i}", "x" if i == 7 else f"b{i}") for i in range(100)]
    src = Keyed.of(
        spark.createDataFrame(rows_src, "k bigint, v1 string, v2 string"), keys=("k",)
    )
    dst = Keyed.of(
        spark.createDataFrame(rows_dst, "k bigint, v1 string, v2 string"), keys=("k",)
    )
    bucket = F.col("k") % 8
    targeted = {r["k"]: r for r in targeted_diff(src, dst, bucket, algo="xxhash64").collect()}
    plain = {r["k"]: r for r in diff(src, dst).collect()}
    assert targeted == plain
    assert 7 in targeted and targeted[7]["status"] == "changed"


def test_checksum_verdict_empty_ranges_equal(kv_pair):
    """Empty vs empty range: identity triple on both sides, equal verdict
    (regression: KeyError when a side produced no groupBy row)."""
    src, dst = kv_pair
    empty_src = Keyed(src.df.filter(F.lit(False)))
    empty_dst = Keyed(dst.df.filter(F.lit(False)))
    v = checksum_verdict(empty_src, empty_dst)
    assert v["equal"]
    assert v["src"]["total_kvs"] == 0 and v["dst"]["total_kvs"] == 0
    # one empty side vs a populated side: unequal, not a crash
    assert not checksum_verdict(src, empty_dst)["equal"]


def test_compare_checksum_two_rows(kv_pair):
    src, dst = kv_pair
    rows = compare_checksum(src, dst).collect()
    assert [r["side"] for r in rows] == ["src", "dst"]


def test_checksum_invariant_to_nullability_metadata(spark):
    """The xxhash64 checksum must be a pure function of row VALUES: two
    sides holding identical data but different schema nullability flags
    (parquet reads mark everything nullable; createDataFrame may not) must
    produce identical triples."""
    from pyspark.sql import types as T

    rows = [(1, "a", None), (2, "c", "b"), (3, "x", "y")]

    def schema(nullable):
        return T.StructType(
            [
                T.StructField("k", T.LongType(), False),
                T.StructField("v1", T.StringType(), nullable),
                T.StructField("v2", T.StringType(), True),
            ]
        )

    loose = Keyed.of(spark.createDataFrame(rows, schema(True)), keys=("k",))
    tight = Keyed.of(spark.createDataFrame(rows, schema(False)), keys=("k",))
    a = checksum(loose, algo="xxhash64").collect()[0]
    b = checksum(tight, algo="xxhash64").collect()[0]
    assert (a["checksum"], a["total_kvs"]) == (b["checksum"], b["total_kvs"])
    v = checksum_verdict(loose, tight)
    assert v["equal"], v
