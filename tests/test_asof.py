"""As-of / range join closed-form tests."""

from pyspark.sql import functions as F

from tikv_data_compare_spark.operators.asof import asof_join, range_join


def test_asof_join_closed_form(spark):
    left = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 50), (3, 1, 5), (4, 2, 100)],
        "event_id long, k long, t long",
    )
    right = spark.createDataFrame(
        [(1, 10, 1000), (1, 60, 2000), (2, 100, 3000)],
        "k long, t long, payload long",
    )
    out = {
        r["event_id"]: r["payload"]
        for r in asof_join(left, right, "k", "t", "t", ["payload"]).collect()
    }
    assert out == {1: 2000, 2: 1000, 3: None, 4: 3000}  # 4: t==100 matches at-or-before


def test_asof_join_inner(spark):
    left = spark.createDataFrame([(1, 1, 5), (2, 1, 50)], "event_id long, k long, t long")
    right = spark.createDataFrame([(1, 10, 7)], "k long, t long, payload long")
    out = asof_join(left, right, "k", "t", "t", ["payload"], how="inner").collect()
    assert [(r["event_id"], r["payload"]) for r in out] == [(2, 7)]


def test_range_join_equals_theta(spark, lineitem):
    pts = lineitem.select("l_orderkey", "l_extendedprice").limit(2000)
    bands = spark.createDataFrame(
        [(0, 0.0, 10_000.0), (1, 10_000.0, 30_000.0), (2, 30_000.0, 120_000.0)],
        "band_id long, lo double, hi double",
    )
    bucketized = range_join(pts, bands, "l_extendedprice", "lo", "hi", 7_000.0).count()
    theta = pts.join(
        bands,
        (F.col("l_extendedprice") >= F.col("lo")) & (F.col("l_extendedprice") < F.col("hi")),
    ).count()
    assert bucketized == theta > 0


def test_range_join_no_cartesian(spark, lineitem):
    from tikv_data_compare_spark import plans

    pts = lineitem.select("l_extendedprice").limit(100)
    bands = spark.createDataFrame([(0, 0.0, 1e6)], "band_id long, lo double, hi double")
    out = range_join(pts, bands, "l_extendedprice", "lo", "hi", 50_000.0)
    assert not plans.has_cartesian(out)


def test_asof_join_null_payload_atomic(spark):
    """A matched right row with a NULL payload column must contribute its own
    NULL — not that column back-filled from an *older* right row (the
    per-column last(ignorenulls) stitching bug, VERDICT r2 item 1)."""
    left = spark.createDataFrame([(1, 1, 100)], "event_id long, k long, t long")
    right = spark.createDataFrame(
        [(1, 10, 111, 222), (1, 50, 333, None)],
        "k long, t long, a long, b long",
    )
    row = asof_join(left, right, "k", "t", "t", ["a", "b"]).collect()[0]
    # the t=50 row is the match; its b is NULL and must stay NULL
    assert (row["a"], row["b"]) == (333, None)


def test_asof_join_inner_keeps_all_null_payload_match(spark):
    """how='inner' must key off the match itself, not payload nullness: a
    right row whose payload columns are all NULL is still a match."""
    left = spark.createDataFrame(
        [(1, 1, 100), (2, 2, 100)], "event_id long, k long, t long"
    )
    right = spark.createDataFrame([(1, 10, None)], "k long, t long, payload long")
    out = asof_join(left, right, "k", "t", "t", ["payload"], how="inner").collect()
    # event 1 matched (payload NULL); event 2 has no right row at all
    assert [(r["event_id"], r["payload"]) for r in out] == [(1, None)]


def test_asof_join_nulls_vs_duckdb_asof(spark, tmp_path):
    """Randomized NULL-heavy fixture against DuckDB's native ASOF JOIN."""
    import random

    import duckdb

    rng = random.Random(7)
    lrows = [(i, rng.randrange(5), rng.randrange(1000)) for i in range(300)]
    rrows = [
        (
            rng.randrange(5),
            rng.randrange(1000),
            rng.randrange(100) if rng.random() < 0.5 else None,
            rng.randrange(100) if rng.random() < 0.5 else None,
        )
        for _ in range(200)
    ]
    # unique (k, t) on the right so the match among ties is well-defined
    seen, rr = set(), []
    for k, t, v1, v2 in rrows:
        if (k, t) not in seen:
            seen.add((k, t))
            rr.append((k, t, v1, v2))
    left = spark.createDataFrame(lrows, "event_id long, k long, t long")
    right = spark.createDataFrame(rr, "k long, t long, a long, b long")
    got = sorted(
        (r["event_id"], r["a"], r["b"])
        for r in asof_join(left, right, "k", "t", "t", ["a", "b"]).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE l(event_id BIGINT, k BIGINT, t BIGINT); "
        "CREATE TABLE r(k BIGINT, t BIGINT, a BIGINT, b BIGINT)"
    )
    con.executemany("INSERT INTO l VALUES (?,?,?)", lrows)
    con.executemany("INSERT INTO r VALUES (?,?,?,?)", rr)
    want = sorted(
        (int(e), None if a is None else int(a), None if b is None else int(b))
        for e, a, b in con.execute(
            "SELECT l.event_id, r.a, r.b FROM l ASOF LEFT JOIN r "
            "ON l.k = r.k AND l.t >= r.t"
        ).fetchall()
    )
    assert got == want


def test_asof_reserved_and_colliding_payload_names(spark):
    left = spark.createDataFrame([(1, 10, "x")], "k int, t int, payload string")
    right = spark.createDataFrame([(1, 5, "y")], "k int, t int, payload string")
    import pytest as _pytest

    from tikv_data_compare_spark.operators.asof import asof_join

    with _pytest.raises(ValueError, match="reserved"):
        asof_join(left, right.withColumnRenamed("payload", "_matched"), "k", "t", "t", ["_matched"])
    with _pytest.raises(ValueError, match="collide"):
        asof_join(left, right, "k", "t", "t", ["payload"])
