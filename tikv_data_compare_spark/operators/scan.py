"""Scan/export operators — the reference's `scan` subcommand.

Reference semantics (scan/scan.go:22-65): paginated ascending key-order scan
of ``[start, end)``, each pair rendered ``key:HEX, value:HEX, cnt:N`` with a
running counter, buffered to a sorted text file.

Spark mapping (SURVEY.md §2.1 S4, §2.5 O1, §2.4 A5): filter → global sort →
hex projection → global running counter → file sink.  Pagination (10240-pair
pages, resume at lastKey+0x00) is subsumed by Spark's iterator execution; the
range predicate pushes into the parquet scan.

The running counter is the one operator where a naive Spark translation
(``row_number`` over an unpartitioned window) collapses to a single
partition.  ``with_global_index`` implements the scalable form: range
partition → per-partition local row_number → broadcast per-partition offsets
— two passes, no single-partition stage, correct dense global numbering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from tikv_data_compare_spark.model import Keyed


def range_scan(keyed: Keyed, start=None, end=None, sort: bool = True) -> DataFrame:
    """Rows of ``keyed`` with first-key in ``[start, end)``, ascending key order.

    The filter compiles to a parquet PushedFilters range (the Spark analogue
    of shipping the range inside the Scan RPC, scan/scan.go:45)."""
    df = keyed.in_range(start, end).df
    return df.orderBy(*keyed.keys) if sort else df


def with_global_index(df: DataFrame, order_cols: list[str], name: str = "cnt", start: int = 1) -> DataFrame:
    """Dense global 1-based index in ``order_cols`` order, scalably.

    Plan shape: range-repartition on the order columns (so partition i holds
    a contiguous key range), local sort + local row_number per partition,
    then add each partition's cumulative offset (a tiny broadcast join —
    #partitions rows).  No global single-partition window; survives 100×
    scale-up where ``Window.orderBy`` without partitioning would not.
    """
    n = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    part = df.repartitionByRange(n, *order_cols).withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    local = part.withColumn("_rn", F.row_number().over(w))
    woff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        local.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn("_off", F.coalesce(F.sum("_cnt").over(woff), F.lit(0)))
        .select("_pid", "_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(name, F.col("_rn") + F.col("_off") + F.lit(start - 1))
        .drop("_pid", "_rn", "_off")
    )


def export_hex(keyed: Keyed, start=None, end=None, path: str | None = None) -> DataFrame:
    """Sorted hex dump with running counter — the reference's scan output line
    ``key:<HEX>, value:<HEX>, cnt:<n>`` (scan/scan.go:52), as a DataFrame
    ``[key_hex, value_hex, cnt]``.

    Binary columns render as uppercase hex directly; typed columns render as
    uppercase hex of their canonical '|'-joined string (same convention both
    in Spark and the DuckDB oracle).  When ``path`` is given, also writes the
    formatted text lines (ordered) there.
    """
    df = keyed.in_range(start, end).df

    def hex_of(cols: tuple[str, ...]) -> F.Column:
        from tikv_data_compare_spark.functions import sqlgen

        types = {fld.name: fld.dataType.typeName() for fld in df.schema.fields}
        if len(cols) == 1 and types[cols[0]] == "binary":
            return F.upper(F.hex(F.col(cols[0])))
        tags = sqlgen.tags_from_spark_schema(df)
        canon = sqlgen.row_canon([(c, tags[c]) for c in cols], sqlgen.SPARK)
        # hex of a string hexes its UTF-8 bytes in both Spark and DuckDB;
        # canonical rendering (not raw casts) keeps it engine-stable
        return F.upper(F.hex(F.expr(canon)))

    hexed = df.select(
        *[F.col(c) for c in keyed.keys],
        hex_of(keyed.keys).alias("key_hex"),
        hex_of(keyed.values).alias("value_hex"),
    )
    numbered = with_global_index(hexed, list(keyed.keys), "cnt").select(
        "key_hex", "value_hex", "cnt"
    )
    if path:
        # global sort only on the file-writing path (ordered part files);
        # the returned DataFrame skips that exchange — callers needing order
        # sort on cnt themselves
        lines = numbered.orderBy("cnt").select(
            F.format_string("key:%s, value:%s, cnt:%d.", "key_hex", "value_hex", "cnt").alias("value")
        )
        lines.write.mode("overwrite").text(path)
    return numbered
