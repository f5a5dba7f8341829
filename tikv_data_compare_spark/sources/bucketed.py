"""Bucketed (pre-partitioned) comparison sources — the shuffle-free diff path.

At 100 TB the dominant cost of a keyed diff is shuffling both sides on the
key.  If the two snapshots are written bucketed on the key (`bucketBy` — the
Spark analogue of both clusters sharing a region layout), the sort-merge join
reads co-located buckets and the exchange disappears entirely: the diff
becomes a zero-shuffle streaming merge per bucket.

Use `write_bucketed` when materializing snapshots that will be compared
repeatedly (the common consistency-check cadence); `read_bucketed` returns a
Keyed over the catalog table so the optimizer sees the bucket spec.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from tikv_data_compare_spark.model import Keyed


def _table_location(spark: SparkSession, table: str) -> str | None:
    """Resolve a table's storage location from the catalog.

    For a registered table, read the Location row of DESCRIBE EXTENDED (works
    for custom locations too).  For an unregistered name (a stale directory
    left by a previous session, which the fresh in-memory catalog has never
    heard of), derive the *default* location from the owning database's
    locationUri — correct for qualified ``db.tbl`` names, unlike gluing
    ``warehouse/<table.lower()>`` together.
    """
    try:
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
            if r["col_name"] == "Location":
                return r["data_type"].removeprefix("file:")
    except Exception:  # noqa: BLE001 — not in the catalog; fall through
        pass
    parts = table.split(".")
    try:
        db = parts[-2] if len(parts) > 1 else spark.catalog.currentDatabase()
        loc = spark.catalog.getDatabase(db).locationUri
    except Exception:  # noqa: BLE001 — unknown database: nothing to clean
        return None
    return os.path.join(loc.removeprefix("file:"), parts[-1].lower())


def write_bucketed(
    df: DataFrame, table: str, keys: list[str], n_buckets: int = 64, mode: str = "overwrite"
) -> None:
    """Materialize a snapshot bucketed+sorted on the comparison key.

    Bucket count is a layout contract: both sides of a future diff must use
    the same ``n_buckets`` for the exchange-free join to kick in.
    """
    spark = df.sparkSession
    if mode == "overwrite":
        # a stale warehouse dir from a previous session isn't in the fresh
        # in-memory catalog, so overwrite alone can't reclaim the location
        loc = _table_location(spark, table)
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        if loc and os.path.isdir(loc):
            shutil.rmtree(loc, ignore_errors=True)
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, keys[0], *keys[1:])
        .sortBy(keys[0], *keys[1:])
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str, keys: tuple[str, ...]) -> Keyed:
    return Keyed.of(spark.table(table), keys=keys)
