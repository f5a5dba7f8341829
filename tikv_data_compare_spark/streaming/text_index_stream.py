"""Streaming maintenance of the persistent BM25 text index — the
continuous-ingest face of operators/text_index.py (r10), completing the
pattern set: checksum manifests (manifest_stream), near-dup band tables
(dedup_stream), and now retrieval statistics all maintain themselves from
an append-only document stream.

Each micro-batch's postings append through ``append_to_text_index``, so
queries rank over the grown corpus with EXACT statistics after every epoch
(df/avgdl re-derive from the written postings — the no-drift contract the
batch API already guarantees).

Exactly-once: ``foreachBatch`` may redeliver an epoch.  Two layers:

1. a ``last_epoch`` watermark in the index meta (threaded through
   ``extra_meta`` so it commits in the SAME meta swap as the doc counts —
   the manifest_stream/dedup_stream pattern): epochs ≤ it skip wholesale;
2. the append itself runs ``on_collision='skip'`` — already-indexed ids
   anti-join out of the batch — so a redelivery inside the window
   (postings appended, meta swap lost) re-appends as a no-op AND completes
   the lost meta swap.  Document ids are therefore the idempotence key:
   the stream must carry stable ids (content-hash ids qualify).

``checkpoint_location`` is REQUIRED for the same reason as the sibling
streams: epoch ids are monotonic only per checkpoint, and a fresh
checkpoint re-lists every source file at epoch 0 — the watermark would
silently skip genuinely-new data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from tikv_data_compare_spark.operators import text_index as ti
from tikv_data_compare_spark.streaming.epochs import epoch_stream, read_last_epoch


def _read_last_epoch(spark, index_path: str) -> int:
    # shared scaffolding incl. crash-window .old recovery (streaming/epochs.py)
    return read_last_epoch(spark, index_path, parts=("postings", "dfreq"))


def ingest_batch_into_text_index(
    batch_df: DataFrame,
    index_path: str,
    epoch_id: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> bool:
    """Fold ONE document batch into the index (bootstrap build on first
    call).  Returns False when the epoch was already applied (redelivery
    skip).  Shared by the streaming sink below and manual incremental
    ingests, mirroring ``dedup_stream.ingest_batch_into_dedup_index``."""
    spark = batch_df.sparkSession
    if epoch_id <= _read_last_epoch(spark, index_path):
        return False
    watermark = {"last_epoch": int(epoch_id)}
    if os.path.exists(f"{index_path}/meta"):
        ti.append_to_text_index(
            batch_df, index_path, id_col=id_col, text_col=text_col,
            on_collision="skip", extra_meta=watermark,
        )
    else:
        ti.build_text_index(
            batch_df, index_path, id_col=id_col, text_col=text_col,
            extra_meta=watermark,
        )
    return True


def text_index_stream(
    stream_df: DataFrame,
    index_path: str,
    checkpoint_location: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    trigger_once: bool = True,
) -> StreamingQuery:
    """Maintain the BM25 index from an append-only document stream.  See
    the module docstring for the exactly-once story; queries against
    ``index_path`` (``query_text_index``) see each epoch's documents with
    exact corpus statistics as soon as its meta swap lands."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        ingest_batch_into_text_index(
            batch_df, index_path, epoch_id, id_col=id_col, text_col=text_col
        )

    return epoch_stream(
        stream_df, checkpoint_location, process, "text_index_stream",
        trigger_once=trigger_once,
    )
