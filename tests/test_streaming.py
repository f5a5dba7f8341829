"""Structured Streaming tests: incremental diff + watermarked window agg."""

import pytest
from pyspark.sql import functions as F

from tikv_data_compare_spark.model import Keyed
from tikv_data_compare_spark.streaming.diff_stream import diff_stream, windowed_counts


@pytest.fixture()
def stream_dir(spark, tmp_path, lineitem):
    """A small parquet dir usable as a file stream source."""
    from tikv_data_compare_spark.model import unique_by_key

    base = unique_by_key(lineitem, ["l_orderkey", "l_linenumber"]).limit(200)
    path = str(tmp_path / "stream_src")
    base.coalesce(1).write.mode("overwrite").parquet(path)
    return path, base


def test_diff_stream_finds_mutations(spark, stream_dir):
    path, base = stream_dir
    schema = base.schema
    # reference = base with 5 quantities perturbed → those arrive as 'changed'
    reference = Keyed.of(
        base.withColumn(
            "l_quantity",
            F.when(F.col("l_orderkey") % 37 == 0, F.col("l_quantity") + 3).otherwise(
                F.col("l_quantity")
            ),
        ),
        keys=("l_orderkey", "l_linenumber"),
    )
    expected = base.filter(F.col("l_orderkey") % 37 == 0).count()
    assert expected > 0

    stream = spark.readStream.schema(schema).parquet(path)
    got = []
    q = diff_stream(
        stream,
        reference,
        keys=("l_orderkey", "l_linenumber"),
        on_batch=lambda df, epoch: got.extend(df.collect()),
    )
    q.awaitTermination(120)
    assert sum(1 for r in got if r["status"] == "changed") == expected
    assert all(r["status"] in ("changed", "only_dst") for r in got)


def test_windowed_counts_stream(spark, tmp_path):
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(minutes=20 * i), "click", 1.0)
        for i in range(9)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string, value double")
    path = str(tmp_path / "events_src")
    df.coalesce(1).write.mode("overwrite").parquet(path)

    stream = spark.readStream.schema(df.schema).parquet(path)
    agg = windowed_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {
        (r["window_start"].isoformat(), r["event_type"]): r["n"]
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    # 9 events at 20-min spacing → 3 per hour window
    assert sum(out.values()) == 9
    assert all(n == 3 for n in out.values())
