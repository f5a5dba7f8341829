"""Skew utilities: salted aggregation/join must equal their unsalted forms."""

from pyspark.sql import functions as F

from tikv_data_compare_spark.operators.skew import salted_agg, salted_join, with_salt


def test_salt_deterministic_and_bounded(spark, lineitem):
    a = with_salt(lineitem.limit(500), 8).select("_salt").collect()
    b = with_salt(lineitem.limit(500), 8).select("_salt").collect()
    assert [r["_salt"] for r in a] == [r["_salt"] for r in b]
    assert all(0 <= r["_salt"] < 8 for r in a)


def test_salted_agg_equals_plain(spark, lineitem):
    df = lineitem.withColumn("h", F.xxhash64("l_orderkey", "l_quantity"))
    plain = {
        (r["l_returnflag"],): (r["n"], r["x"])
        for r in df.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.bit_xor("h").alias("x"))
        .collect()
    }
    salted = {
        (r["l_returnflag"],): (r["n"], r["x"])
        for r in salted_agg(
            df,
            ["l_returnflag"],
            {
                "n": (F.count(F.lit(1)), F.sum("n")),
                "x": (F.bit_xor("h"), F.bit_xor("x")),
            },
            n_salts=8,
        ).collect()
    }
    assert plain == salted


def test_salted_join_equals_plain(spark, lineitem):
    big = lineitem.select("l_orderkey", "l_quantity").limit(2000)
    small = (
        lineitem.select("l_orderkey").distinct().limit(50).withColumn("tag", F.lit("t"))
    )
    plain = big.join(small, on=["l_orderkey"]).count()
    salted = salted_join(big, small, on=["l_orderkey"], n_salts=4).count()
    assert plain == salted


def test_skew_agg_query_equals_plain_groupby(spark):
    """The driver query form: salted two-stage agg ≡ plain GROUP BY."""
    from tests.conftest import SF_DIR
    from tikv_data_compare_spark.queries import _dc, _events_ms, q_skew_agg

    got = {
        r["event_type"]: (r["n"], r["v1"], r["v2"])
        for r in q_skew_agg(spark, SF_DIR).filter("part = 'salted'").collect()
    }
    e, _ = _events_ms(spark, SF_DIR)
    want = {
        r["event_type"]: (r["n"], r["s"], r["m"])
        for r in e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr(_dc("value"))).alias("s"),
            F.max(F.expr(_dc("value"))).alias("m"),
        )
        .collect()
    }
    assert got == want


def test_sessionize_hot_user_within_2x_of_uniform(spark):
    """Sessionize's shuffle key is user-controlled: pin the AQE skew
    behavior with one user owning 20% of all events at sf0.1 — wall-time
    must stay within ~2x of the uniform layout (min-of-2 each, warmed).

    The wall-clock ratio is load-sensitive on shared runners, so the timing
    assertion only fires under SPARK_GRAFT_TIMING_ASSERTS=1 (r7, ADVICE);
    the skewed run itself (completion + row parity with the uniform layout)
    is always asserted."""
    import os
    import time

    from tikv_data_compare_spark.operators.events import sessionize
    from tikv_data_compare_spark.queries import _events_ms

    e, ms = _events_ms(spark, "/root/testdata/sf0.1")
    base = e.select("user_id", "event_id", ms.alias("ms")).cache()
    hot = base.withColumn(
        "user_id",
        F.when(F.col("event_id") % 5 == 0, F.lit(1)).otherwise(F.col("user_id")),
    ).cache()
    n = base.count()
    assert hot.filter(F.col("user_id") == 1).count() >= n // 5

    def best_of(df):
        t = []
        for _ in range(2):
            t0 = time.time()
            sessionize(df).count()
            t.append(time.time() - t0)
        return min(t)

    best_of(base)  # codegen warmup, not measured
    uniform = best_of(base)
    skewed = best_of(hot)
    # correctness under skew is always asserted: sessions conserve events
    assert sessionize(hot).agg(F.sum("n_events")).first()[0] == n
    base.unpersist()
    hot.unpersist()
    if os.environ.get("SPARK_GRAFT_TIMING_ASSERTS") == "1":
        assert skewed <= max(2.0 * uniform, uniform + 1.0), (skewed, uniform)


# ------------------------------------------------------------- hot keys


def test_hot_keys_exact_counts_and_share(spark):
    from tikv_data_compare_spark.operators.skew import hot_keys

    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1, "k string"
    )
    rows = hot_keys(df, ["k"], top_n=2).collect()
    got = {r["k"]: r for r in rows}
    assert [r["k"] for r in sorted(rows, key=lambda r: r["rank"])] == ["a", "b"]
    assert got["a"]["n"] == 6 and got["a"]["share_bp"] == 6000
    assert got["b"]["n"] == 3 and got["b"]["share_bp"] == 3000
    # top_n=2 cuts 'c'
    assert "c" not in got


def test_hot_keys_tiebreak_and_validation(spark):
    import pytest

    from tikv_data_compare_spark.operators.skew import hot_keys

    df = spark.createDataFrame([("b",), ("a",), ("c",)], "k string")
    rows = sorted(hot_keys(df, ["k"], top_n=3).collect(), key=lambda r: r["rank"])
    # equal counts -> key-ascending order decides ranks deterministically
    assert [r["k"] for r in rows] == ["a", "b", "c"]
    with pytest.raises(ValueError):
        hot_keys(df, ["k"], top_n=0)


def test_hot_keys_composite_key(spark):
    from tikv_data_compare_spark.operators.skew import hot_keys

    df = spark.createDataFrame(
        [("x", 1)] * 4 + [("x", 2)] * 2 + [("y", 1)] * 2,
        "k string, sub long",
    )
    top = hot_keys(df, ["k", "sub"], top_n=1).collect()
    assert len(top) == 1
    assert (top[0]["k"], top[0]["sub"], top[0]["n"], top[0]["share_bp"]) == ("x", 1, 4, 5000)
