"""Bucketed diff: correctness + the zero-shuffle plan property."""

from pyspark.sql import functions as F

from tikv_data_compare_spark import plans
from tikv_data_compare_spark.operators.diff import diff
from tikv_data_compare_spark.sources.bucketed import read_bucketed, write_bucketed


def test_bucketed_diff_no_exchange(spark, lineitem):
    from tikv_data_compare_spark.model import unique_by_key

    base = unique_by_key(lineitem, ["l_orderkey", "l_linenumber"]).limit(3000)
    mutated = base.withColumn(
        "l_quantity",
        F.when(F.col("l_orderkey") % 53 == 0, F.col("l_quantity") + 2).otherwise(
            F.col("l_quantity")
        ),
    )
    keys = ["l_orderkey", "l_linenumber"]
    write_bucketed(base, "b_src", keys, n_buckets=8)
    write_bucketed(mutated, "b_dst", keys, n_buckets=8)

    s = read_bucketed(spark, "b_src", tuple(keys))
    d = read_bucketed(spark, "b_dst", tuple(keys))
    findings = diff(s, d)

    expected = base.filter(F.col("l_orderkey") % 53 == 0).count()
    assert findings.count() == expected > 0

    # both sides bucketed on the join key → the sort-merge join reads
    # co-located buckets and no shuffle exchange appears in the plan
    plan = plans.plan_string(findings)
    join_section = plan
    assert "Exchange" not in join_section.split("ReadSchema")[0].replace(
        "BroadcastExchange", ""
    ), plan[:2000]


def test_write_bucketed_qualified_name_overwrites(spark, lineitem):
    """Overwriting a db-qualified bucketed table resolves the location from
    the catalog (regression: warehouse/<table.lower()> glued 'db.tbl' into a
    bogus path, leaving the real directory stale)."""
    import os

    base = lineitem.limit(100)
    spark.sql("CREATE DATABASE IF NOT EXISTS bdb")
    try:
        write_bucketed(base, "bdb.b_qual", ["l_orderkey"], n_buckets=4)
        first = spark.table("bdb.b_qual").count()
        # overwrite must reclaim the real location — no leftover-file error,
        # no doubled rows
        write_bucketed(base, "bdb.b_qual", ["l_orderkey"], n_buckets=4)
        assert spark.table("bdb.b_qual").count() == first == 100
        loc = (
            spark.sql("DESCRIBE TABLE EXTENDED bdb.b_qual")
            .filter("col_name = 'Location'")
            .first()["data_type"]
            .removeprefix("file:")
        )
        assert os.path.isdir(loc)
        # stale-dir path: table unknown to the catalog (fresh session) but
        # files linger at the default location — overwrite must reclaim it
        spark.sql("DROP TABLE bdb.b_qual")
        os.makedirs(loc, exist_ok=True)
        with open(os.path.join(loc, "stale-part.parquet"), "w") as fh:
            fh.write("junk")
        write_bucketed(base, "bdb.b_qual", ["l_orderkey"], n_buckets=4)
        assert spark.table("bdb.b_qual").count() == 100
        assert not os.path.exists(os.path.join(loc, "stale-part.parquet"))
    finally:
        spark.sql("DROP TABLE IF EXISTS bdb.b_qual")
        spark.sql("DROP DATABASE IF EXISTS bdb")
