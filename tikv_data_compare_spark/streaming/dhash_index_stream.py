"""Streaming maintenance of the persistent dHash band index — the
continuous-ingest face of operators/dhash_index.py (r12), completing the
self-maintaining artifact set: checksum manifests, minhash band tables,
BM25 statistics, the ANN index, and now the image near-dup index all fold
an append-only stream.

Each epoch's images hash map-side (``multimodal.image_dhash`` — pure
per-image integer function, so batch hashes and stored hashes are always
comparable) and their band rows append through ``append_to_dhash_index``;
undecodable images (NULL hash) never index, by the operator contract.

Exactly-once: ``foreachBatch`` may redeliver an epoch.  The ``last_epoch``
watermark in the index meta (threaded through ``extra_meta`` so it commits
in the SAME meta swap as the doc count) skips epochs ≤ it wholesale.
Unlike the text index there is no collision-skip layer: a crash-window
redelivery (bands appended, meta swap lost) re-appends the same band rows,
which is HARMLESS for candidate correctness — ``query_dhash_index`` is
distinct over verified pairs and ``n_docs`` recounts distinct ids — the
same duplicate-tolerance the dedup band index documents.  Ids must still
be stable across redeliveries (content-hash ids qualify).

``checkpoint_location`` is REQUIRED for the same reason as the sibling
streams: epoch ids are monotonic only per checkpoint, and a fresh
checkpoint re-lists every source file at epoch 0 — the watermark would
silently skip genuinely-new data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from tikv_data_compare_spark.operators import dhash_index as dhi
from tikv_data_compare_spark.operators.multimodal import image_dhash
from tikv_data_compare_spark.streaming.epochs import epoch_stream, read_last_epoch


def _read_last_epoch(spark, index_path: str) -> int:
    # shared scaffolding incl. crash-window .old recovery (streaming/epochs.py)
    return read_last_epoch(spark, index_path, parts=("bands",))


def ingest_batch_into_dhash_index(
    batch_df: DataFrame,
    index_path: str,
    epoch_id: int = 0,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    n_bands: int = 8,
) -> bool:
    """Hash ONE image batch and fold its band rows into the index
    (bootstrap build on first call).  Returns False when the epoch was
    already applied (redelivery skip).  ``n_bands`` applies to the
    bootstrap only; later epochs band with the stored geometry.  Shared by
    the streaming sink below and manual incremental ingests, mirroring the
    text/ANN/dedup siblings."""
    spark = batch_df.sparkSession
    if epoch_id <= _read_last_epoch(spark, index_path):
        return False
    watermark = {"last_epoch": int(epoch_id)}
    hashes = image_dhash(batch_df, id_col=id_col, payload_col=payload_col)
    if os.path.exists(f"{index_path}/meta"):
        dhi.append_to_dhash_index(
            hashes, index_path, id_col=id_col, extra_meta=watermark
        )
    else:
        dhi.build_dhash_index(
            hashes, index_path, id_col=id_col, n_bands=n_bands,
            extra_meta=watermark,
        )
    return True


def dhash_index_stream(
    stream_df: DataFrame,
    index_path: str,
    checkpoint_location: str | None = None,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    n_bands: int = 8,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Maintain the dHash band index from an append-only image stream.
    See the module docstring for the exactly-once story; queries against
    ``index_path`` (``query_dhash_index``) see each epoch's images as soon
    as its meta swap lands."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        ingest_batch_into_dhash_index(
            batch_df, index_path, epoch_id, id_col=id_col,
            payload_col=payload_col, n_bands=n_bands,
        )

    return epoch_stream(
        stream_df, checkpoint_location, process, "dhash_index_stream",
        trigger_once=trigger_once,
    )
