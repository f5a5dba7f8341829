"""Streaming incremental near-dup detection over an append-only document
stream — the continuous-ingest face of the persistent dedup index.

A training-data feed never re-dedups the corpus: each arriving micro-batch
must answer "which of these documents duplicate something we ALREADY have"
while becoming part of "what we have" for the next batch.  Composing two
existing pieces gives exactly that:

1. the batch's intra-batch near-dup pairs — the ordinary LSH self-join
   (``dedup.minhash_pairs``), map-side signatures + one band equi-join;
2. the batch's cross pairs against everything ingested before it —
   ``dedup_index.query_dedup_index`` against the stored band table;
3. the batch's own band keys appended (``append_to_dedup_index``) so the
   NEXT batch's step 2 sees it.

Because MinHash signatures are per-document pure functions, the union of
all epochs' (intra ∪ cross) pairs equals the one-shot batch self-join over
the full corpus — chunking must not matter, and the pytest contract pins
exactly that (chunked ≡ batch pair-set identity).

Exactly-once: ``foreachBatch`` may redeliver an epoch.  A re-run of step 3
would duplicate the epoch's band rows — harmless for candidate
correctness (query() is distinct, ``n_docs`` recounts distinct ids) but a
redelivered query against an index that now CONTAINS the batch would
reclassify its intra pairs as cross pairs and rewrite a different pair
set into the same epoch directory.  The index meta therefore carries a
``last_epoch`` watermark (the manifest_stream pattern): epochs ≤ it are
skipped wholesale.  As there, the watermark is only meaningful against a
PERSISTENT stream checkpoint — ``checkpoint_location`` is required and
restart correctness depends on reusing it.

Per-epoch pair output lands under ``{pairs_out}/epoch=N/`` (overwrite per
epoch, so a retried write is idempotent); read the whole directory for
the accumulated pair log.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from tikv_data_compare_spark.functions.fsutil import swap_commit
from tikv_data_compare_spark.operators import dedup as dd
from tikv_data_compare_spark.operators import dedup_index as di


def _read_last_epoch(spark, index_path: str) -> int:
    meta_path = f"{index_path}/meta"
    if not os.path.exists(meta_path):
        return -1
    meta = spark.read.parquet(meta_path).collect()[0].asDict()
    return int(meta.get("last_epoch", -1))


def ingest_batch_into_dedup_index(
    batch_df: DataFrame,
    index_path: str,
    pairs_out: str | None = None,
    epoch_id: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    algo: str = "md5i64",
) -> bool:
    """Process ONE batch: emit its near-dup pairs (intra-batch + against
    the index), then append its band keys.  Returns False when the epoch
    was already applied (redelivery skip).  The first batch bootstraps the
    index (intra pairs only — there is nothing to cross against yet);
    ``algo`` applies only to that bootstrap, later batches read it from
    the index meta.

    Shared by the streaming sink below and any batch caller doing manual
    incremental ingests (e.g. nightly drops), mirroring
    ``manifest_stream.fold_batch_into_manifest``.

    Pair schema: ``(doc_a, doc_b, side)`` with ``doc_a < doc_b`` and
    ``side ∈ {'intra', 'cross'}``.  Candidates only — run
    ``dedup.jaccard_for_pairs`` over the accumulated log for the exact
    verify (the index stores no text, by design).
    """
    spark = batch_df.sparkSession
    if epoch_id <= _read_last_epoch(spark, index_path):
        return False
    exists = os.path.exists(f"{index_path}/meta")
    idx = di.load_dedup_index(spark, index_path) if exists else None
    intra = dd.minhash_pairs(
        batch_df, id_col, text_col, algo=(idx.meta["algo"] if idx else algo)
    ).select("doc_a", "doc_b", F.lit("intra").alias("side"))
    if exists:
        cross = di.query_dedup_index(
            batch_df, index_path, id_col=id_col, text_col=text_col
        ).select(
            F.least("new_id", "indexed_id").alias("doc_a"),
            F.greatest("new_id", "indexed_id").alias("doc_b"),
            F.lit("cross").alias("side"),
        )
        pairs = intra.unionByName(cross)
    else:
        pairs = intra
    if pairs_out is not None:
        # per-epoch overwrite: a retried foreachBatch write is idempotent
        pairs.write.mode("overwrite").parquet(f"{pairs_out}/epoch={int(epoch_id)}")
    if exists:
        di.append_to_dedup_index(batch_df, index_path, id_col=id_col, text_col=text_col)
        meta = di.load_dedup_index(spark, index_path).meta
    else:
        meta = di.build_dedup_index(
            batch_df, index_path, id_col=id_col, text_col=text_col, algo=algo
        )
    # commit the watermark via the same one-directory meta swap the
    # build/append path uses; bands+meta remain two commits (see module
    # docstring for why redelivered band appends are tolerable)
    swap_commit(
        spark.createDataFrame(
            [tuple({**meta, "last_epoch": int(epoch_id)}.values())],
            list({**meta, "last_epoch": int(epoch_id)}.keys()),
        ),
        f"{index_path}/meta",
        coalesce=1,
    )
    return True


def dedup_stream(
    stream_df: DataFrame,
    index_path: str,
    pairs_out: str,
    checkpoint_location: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    algo: str = "md5i64",
    trigger_once: bool = True,
) -> StreamingQuery:
    """Maintain the dedup index from an append-only document stream,
    emitting each micro-batch's near-dup pairs to ``{pairs_out}/epoch=N``.

    ``checkpoint_location`` is REQUIRED for the same reason as
    ``manifest_stream``: epoch ids are monotonic only per checkpoint, and
    the ``last_epoch`` redelivery watermark is keyed on them — a fresh
    checkpoint re-lists every source file at epoch 0 and the watermark
    would silently skip genuinely-new data.
    """
    if checkpoint_location is None:
        raise ValueError(
            "dedup_stream requires checkpoint_location= — a fresh checkpoint "
            "restarts epoch ids at 0 and the last_epoch watermark would skip "
            "new data; reuse one directory per source+index pair"
        )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ingest_batch_into_dedup_index(
            batch_df, index_path, pairs_out, epoch_id,
            id_col=id_col, text_col=text_col, algo=algo,
        )

    writer = (
        stream_df.writeStream.foreachBatch(process)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_location)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
