"""Shared epoch-watermark scaffolding for the self-maintaining artifact
streams (dedup band index, BM25 text index, ANN index, dHash band index,
Bloom filter).

Every one of those streams follows the same exactly-once recipe: a
``last_epoch`` watermark rides in the index meta (committed in the SAME
atomic meta swap as the index's own counters), ``foreachBatch`` epochs at
or below it are skipped wholesale, and the writer requires an explicit
checkpoint because epoch ids are only monotonic per checkpoint.  This
module is the single implementation of that recipe — the watermark read,
the crash-window ``.old`` recovery, and the writer wiring — so a hardening
fix lands once, not five times (r12 review).

Crash-window recovery: ``swap_commit`` is rename-aside, so a crash between
its two renames leaves only ``<dir>.old``.  swap_commit itself recovers on
its NEXT invocation — but the streams decide bootstrap-vs-append by
checking the meta's existence BEFORE any swap_commit runs, and a bare
existence check against a half-swapped index would re-bootstrap over it,
silently discarding everything previously ingested.  ``read_last_epoch``
therefore recovers every artifact directory first (rename back, never
delete) and only then reads the watermark.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from tikv_data_compare_spark.functions.fsutil import recover_swap


def read_last_epoch(
    spark, index_path: str, parts: tuple[str, ...] = ()
) -> int:
    """Recover ``meta`` plus the family's artifact subdirs from any
    half-completed swap, then read the ``last_epoch`` watermark (-1 when
    the index does not exist yet — the bootstrap signal)."""
    for p in ("meta", *parts):
        recover_swap(f"{index_path}/{p}")
    if not os.path.exists(f"{index_path}/meta"):
        return -1
    meta = spark.read.parquet(f"{index_path}/meta").collect()[0].asDict()
    return int(meta.get("last_epoch", -1))


def epoch_stream(
    stream_df: DataFrame,
    checkpoint_location: str | None,
    process,
    name: str,
    trigger_once: bool = True,
) -> StreamingQuery:
    """The shared writer wiring: ``foreachBatch(process)`` in update mode
    with a REQUIRED checkpoint — a fresh checkpoint restarts epoch ids at
    0 and the last_epoch watermark would silently skip genuinely-new
    data."""
    if checkpoint_location is None:
        raise ValueError(
            f"{name} requires checkpoint_location= — a fresh checkpoint "
            "restarts epoch ids at 0 and the last_epoch watermark would "
            "skip new data; reuse one directory per source+index pair"
        )

    def _guarded(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        process(batch_df, epoch_id)

    writer = (
        stream_df.writeStream.foreachBatch(_guarded)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_location)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
