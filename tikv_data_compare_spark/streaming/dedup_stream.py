"""Streaming incremental near-dup detection over an append-only document
stream — the continuous-ingest face of the persistent dedup index.

A training-data feed never re-dedups the corpus: each arriving micro-batch
must answer "which of these documents duplicate something we ALREADY have"
while becoming part of "what we have" for the next batch.  Composing two
existing pieces gives exactly that:

1. the batch's intra-batch near-dup pairs — the ordinary LSH self-join
   (``dedup.minhash_pairs``), map-side signatures + one band equi-join,
   run at the INDEX's band geometry so intra and cross candidates share
   one similarity threshold;
2. the batch's cross pairs against everything ingested before it —
   ``dedup_index.query_dedup_index`` against the stored band table;
3. the batch's own band keys appended (``append_to_dedup_index``) so the
   NEXT batch's step 2 sees it.

Because MinHash signatures are per-document pure functions, the union of
all epochs' (intra ∪ cross) pairs equals the one-shot batch self-join over
the full corpus — chunking must not matter, and the pytest contract pins
exactly that (chunked ≡ batch pair-set identity).

Exactly-once: ``foreachBatch`` may redeliver an epoch.  The index meta
carries a ``last_epoch`` watermark (the manifest_stream pattern): epochs
≤ it are skipped wholesale.  The watermark commits IN THE SAME meta swap
as the band append's doc count (``extra_meta`` threading, r9 ADVICE), so
the only redelivery window left is "bands appended, meta swap lost" — and
that window is label-stable too: cross candidates whose ``indexed_id`` is
in the CURRENT batch (which only happens when the batch's own bands are
already in the index from the half-committed first attempt) are filtered
out before the pair write, so a re-run emits the identical
``(doc_a, doc_b, side)`` set — duplicate band rows are the sole residue,
harmless by construction (query() is distinct, ``n_docs`` recounts
distinct ids).  As with the manifests, the watermark is only meaningful
against a PERSISTENT stream checkpoint — ``checkpoint_location`` is
required and restart correctness depends on reusing it.

Per-epoch pair output lands under ``{pairs_out}/epoch=N/`` (overwrite per
epoch, so a retried write is idempotent); read the whole directory for
the accumulated pair log.

Since r10 an optional ``labels_path`` maintains the CANONICALIZATION too:
each epoch's pairs fold into a persisted ``(id, component)`` label table
via incremental union-find (``fold_pairs_into_labels`` →
``graph.incremental_components``) — keep/drop verdicts stay current
without ever re-reading the pair log or re-solving the corpus graph.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from tikv_data_compare_spark.functions.fsutil import swap_commit
from tikv_data_compare_spark.operators import dedup as dd
from tikv_data_compare_spark.operators import dedup_index as di
from tikv_data_compare_spark.operators import graph as gr
from tikv_data_compare_spark.streaming.epochs import epoch_stream, read_last_epoch


def _read_last_epoch(spark, index_path: str) -> int:
    # shared scaffolding incl. crash-window .old recovery (streaming/epochs.py)
    return read_last_epoch(spark, index_path, parts=("bands",))


def fold_pairs_into_labels(pairs: DataFrame, labels_path: str) -> None:
    """Fold one epoch's candidate pairs into the persisted ``(id,
    component)`` label table at ``labels_path`` — incremental
    canonicalization over the streamed pair log (r10).

    ``graph.incremental_components`` does the union-find fold (the
    corpus-sized label table is joined against a batch-bounded merge map,
    never re-solved; the accumulated pair log is never re-read), and the
    rewrite lands through the same rename-aside ``swap_commit`` as the
    manifests.  Refolding an epoch is a no-op (already-merged edges map to
    self-loops), so the fold sits safely INSIDE the index's redelivery
    window: a crash after this swap but before the meta watermark replays
    the identical pair set into labels it already holds.

    The canonical kept-set falls out as ``component = id`` (the min-id
    representative keeps, every other member drops) — maintained per
    epoch, not recomputed, closing the r9 verdict's batch-only gap.
    """
    spark = pairs.sparkSession
    prior = (
        spark.read.parquet(labels_path) if os.path.exists(labels_path) else None
    )
    updated = gr.incremental_components(prior, pairs)
    swap_commit(updated, labels_path)


def ingest_batch_into_dedup_index(
    batch_df: DataFrame,
    index_path: str,
    pairs_out: str | None = None,
    epoch_id: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
    algo: str = "md5i64",
    n_bands: int = 4,
    rows_per_band: int = 2,
    labels_path: str | None = None,
) -> bool:
    """Process ONE batch: emit its near-dup pairs (intra-batch + against
    the index), then append its band keys.  Returns False when the epoch
    was already applied (redelivery skip).  The first batch bootstraps the
    index (intra pairs only — there is nothing to cross against yet);
    ``algo``/``n_bands``/``rows_per_band`` apply only to that bootstrap,
    later batches read both from the index meta so every epoch is hashed
    and banded identically.

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
        batch_df, id_col, text_col,
        algo=(idx.meta["algo"] if idx else algo),
        n_bands=(idx.meta["n_bands"] if idx else n_bands),
        rows_per_band=(idx.meta["rows_per_band"] if idx else rows_per_band),
    ).select("doc_a", "doc_b", F.lit("intra").alias("side"))
    if exists:
        # Anti-join out candidates whose indexed side is in THIS batch:
        # normally none exist (the batch is appended after the query), but a
        # redelivered epoch whose first attempt crashed between the bands
        # append and the meta swap queries an index that already holds the
        # batch — without the filter its intra pairs would reappear labeled
        # 'cross' (r9 verdict #2).  Broadcast-sized: one id column of a
        # micro-batch.
        batch_ids = batch_df.select(F.col(id_col).alias("indexed_id")).distinct()
        cross = (
            di.query_dedup_index(batch_df, index_path, id_col=id_col, text_col=text_col)
            .join(F.broadcast(batch_ids), on="indexed_id", how="left_anti")
            .select(
                F.least("new_id", "indexed_id").alias("doc_a"),
                F.greatest("new_id", "indexed_id").alias("doc_b"),
                F.lit("cross").alias("side"),
            )
        )
        pairs = intra.unionByName(cross)
    else:
        pairs = intra
    if pairs_out is not None:
        # per-epoch overwrite: a retried foreachBatch write is idempotent
        pairs.write.mode("overwrite").parquet(f"{pairs_out}/epoch={int(epoch_id)}")
    if labels_path is not None:
        # incremental canonicalization (r10): fold this epoch's pairs into
        # the persisted label table BEFORE the watermark commit — the fold
        # is idempotent, so a redelivery inside the window just re-applies
        fold_pairs_into_labels(
            pairs.select("doc_a", "doc_b"), labels_path
        )
    # the last_epoch watermark rides in the SAME meta swap as the doc count
    # (extra_meta) — watermark and count commit together, shrinking the
    # redelivery window to the bands append alone (r9 ADVICE)
    watermark = {"last_epoch": int(epoch_id)}
    if exists:
        di.append_to_dedup_index(
            batch_df, index_path, id_col=id_col, text_col=text_col,
            extra_meta=watermark,
        )
    else:
        di.build_dedup_index(
            batch_df, index_path, id_col=id_col, text_col=text_col, algo=algo,
            n_bands=n_bands, rows_per_band=rows_per_band, extra_meta=watermark,
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
    n_bands: int = 4,
    rows_per_band: int = 2,
    trigger_once: bool = True,
    labels_path: str | None = None,
) -> StreamingQuery:
    """Maintain the dedup index from an append-only document stream,
    emitting each micro-batch's near-dup pairs to ``{pairs_out}/epoch=N``.

    ``checkpoint_location`` is REQUIRED for the same reason as
    ``manifest_stream``: epoch ids are monotonic only per checkpoint, and
    the ``last_epoch`` redelivery watermark is keyed on them — a fresh
    checkpoint re-lists every source file at epoch 0 and the watermark
    would silently skip genuinely-new data.
    """

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        ingest_batch_into_dedup_index(
            batch_df, index_path, pairs_out, epoch_id,
            id_col=id_col, text_col=text_col, algo=algo,
            n_bands=n_bands, rows_per_band=rows_per_band,
            labels_path=labels_path,
        )

    return epoch_stream(
        stream_df, checkpoint_location, process, "dedup_stream",
        trigger_once=trigger_once,
    )
