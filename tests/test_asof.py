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
