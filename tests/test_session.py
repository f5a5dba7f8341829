"""Session plumbing: executor self-shipping and scale_out invariants."""

import zipfile

from pyspark import SparkFiles


def test_ship_package_registers_source_zip(spark):
    """get_spark must have shipped the package source via addPyFile so
    executor Python workers can import module-referenced closure helpers
    (the media decoders, the codec) without a cluster-wide install."""
    sc = spark.sparkContext
    assert getattr(sc, "_tdcs_package_shipped", False)
    shipped = [f for f in sc.listFiles if "tikv_data_compare_spark-ship" in f]
    assert shipped, f"package zip not in sc.listFiles: {sc.listFiles}"
    local = SparkFiles.get(shipped[0].rsplit("/", 1)[-1])
    with zipfile.ZipFile(local) as zf:
        names = zf.namelist()
    assert "tikv_data_compare_spark/operators/media_decode.py" in names
    assert "tikv_data_compare_spark/codec.py" in names


def test_ship_package_idempotent(spark):
    from tikv_data_compare_spark.session import ship_package

    before = list(spark.sparkContext.listFiles)
    ship_package(spark)
    ship_package(spark)
    assert list(spark.sparkContext.listFiles) == before
