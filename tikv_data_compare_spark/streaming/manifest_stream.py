"""Streaming maintenance of checksum manifests.

The batch manifest flow (operators/checksum.py: ``save_checksum_manifest`` /
``compare_to_manifest``) snapshots per-bucket ``(XOR-checksum, count)``
triples so drift detection never rescans the old snapshot.  This module
keeps that manifest CONTINUOUSLY up to date from an append-only stream:
each micro-batch's bucket triples are folded into the stored manifest under
the same commutative monoid the reference merges region checksums with
(``(XOR, +)``, checksum/checksum.go:25-29) — so the streamed manifest is
BIT-IDENTICAL to one built from the full table in batch, regardless of how
the rows were chunked into micro-batches (order-independence is the
monoid's whole point, and the equality is contract-tested).

Exactly-once: ``foreachBatch`` may redeliver an epoch after a failure, and
an XOR fold is NOT idempotent — folding the same batch twice cancels its
checksum contribution and double-counts kvs.  The stored manifest therefore
carries a ``last_epoch`` watermark and silently skips epochs ≤ it.  The
watermark lives INSIDE the triples table (a constant column), so the data
and the watermark commit in ONE directory swap — a crash between two
separate commits could otherwise leave an epoch's data applied but
unmarked (or vice versa), and the redelivery would corrupt the fold
(r8 review).

Scale notes: per micro-batch the work is one map-side hash + one ~16
B/bucket aggregation, then a merge against a bucket-count-sized table —
nothing grows with stream history except the manifest itself (bounded by
the bucket count).  The swap-directory commit below is a local-FS stand-in
for what a production deployment does with a transactional table format.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from tikv_data_compare_spark.functions.fsutil import swap_commit
from tikv_data_compare_spark.model import Keyed
from tikv_data_compare_spark.operators.checksum import bucket_triples, range_bucket_col

_TRIPLES = "triples"
_RANGE_META = ("range_key", "range_boundaries")


def _read_watermark(spark, path: str) -> int:
    """Highest epoch already folded into the manifest, or -1 when no
    manifest exists yet.  A present-but-unreadable manifest RAISES — a
    silent -1 there would reset the watermark and let a redelivered epoch
    corrupt the fold (r8 review)."""
    triples_path = f"{path}/{_TRIPLES}"
    if not os.path.exists(triples_path):
        return -1
    row = spark.read.parquet(triples_path).agg(F.max("last_epoch").alias("e")).first()
    return int(row["e"]) if row and row["e"] is not None else -1


def fold_batch_into_manifest(
    batch: Keyed, path: str, bucket, algo: str = "xxhash64", epoch_id: int = 0
) -> bool:
    """Fold ONE batch's bucket triples into the manifest at ``path``;
    returns False when the epoch was already applied (redelivery skip).

    Shared by the streaming sink below and any batch caller doing manual
    incremental loads (e.g. nightly partition appends).
    """
    spark = batch.df.sparkSession
    if epoch_id <= _read_watermark(spark, path):
        return False
    new = bucket_triples(batch, bucket, algo)
    triples_path = f"{path}/{_TRIPLES}"
    if os.path.exists(triples_path):
        old = spark.read.parquet(triples_path).drop("last_epoch")
        got = [r["algo"] for r in old.select("algo").distinct().collect()]
        if got and got != [algo]:
            raise ValueError(
                f"manifest at {path!r} was built with algo={got}, fold requested "
                f"{algo!r} — triples of different hash algorithms are not mergeable"
            )
        merged = (
            old.unionByName(new)
            .groupBy("bucket")
            .agg(
                # the region-merge monoid, applied across generations: XOR of
                # the per-generation checksums, sum of the counts
                F.bit_xor("cksum").alias("cksum"),
                F.sum("kvs").alias("kvs"),
            )
            .withColumn("algo", F.lit(algo))
        )
    else:
        merged = new
    # ONE swap commits data + watermark atomically (local-FS rename)
    swap_commit(merged.withColumn("last_epoch", F.lit(int(epoch_id))), triples_path)
    return True


def manifest_stream(
    stream_df: DataFrame,
    keys: tuple[str, ...],
    path: str,
    bucket_expr,
    algo: str = "xxhash64",
    trigger_once: bool = True,
) -> StreamingQuery:
    """Maintain a checksum manifest from an append-only stream.

    ``bucket_expr`` is a zero-arg callable returning the bucket Column
    (callables, because Columns must be built on the micro-batch's lineage).
    The resulting ``{path}/triples`` parquet has the exact
    ``(bucket, cksum, kvs, algo)`` schema of ``save_checksum_manifest``
    output, so ``compare_to_manifest(..., manifest=spark.read.parquet(
    f"{path}/triples"))`` consumes it directly.
    """

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        fold_batch_into_manifest(
            Keyed.of(batch_df, keys=keys), path, bucket_expr(), algo, epoch_id
        )

    writer = stream_df.writeStream.foreachBatch(process).outputMode("update")
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
