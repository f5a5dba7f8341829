"""Streaming maintenance of the persistent Bloom membership filter — the
continuous-ingest face of operators/bloom.py, joining the self-maintaining
artifact set (checksum manifests, minhash band tables, BM25 statistics,
the ANN index, the dHash band index).

The natural deployment: a blocklist / held-out-fingerprint stream ORs into
the fixed-size bitmap as it arrives, and every curation run probes the
CURRENT filter with one bounded broadcast.  Each epoch's work is
batch-sized plus the bounded stored word table (≤ ceil(m_bits/63) rows) —
never corpus-sized.

Exactly-once: ``foreachBatch`` may redeliver an epoch.  The ``last_epoch``
watermark in the index meta (threaded through ``extra_meta``, committing in
the SAME atomic meta swap as ``n_items``) skips epochs ≤ it wholesale.
There is no collision layer at all here: a crash-window redelivery re-ORs
the same bits, and ``bit_or`` is idempotent — the bitmap is EXACTLY the
same afterward; only the additive ``n_items`` observability counter can
overcount across a lost swap (documented on ``append_to_bloom_index``).

``checkpoint_location`` is REQUIRED for the same reason as every sibling
stream: epoch ids are monotonic only per checkpoint, and a fresh checkpoint
re-lists every source file at epoch 0 — the watermark would silently skip
genuinely-new data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from tikv_data_compare_spark.operators import bloom as bl
from tikv_data_compare_spark.streaming.epochs import epoch_stream, read_last_epoch


def _read_last_epoch(spark, index_path: str) -> int:
    # shared scaffolding incl. crash-window .old recovery (streaming/epochs.py)
    return read_last_epoch(spark, index_path, parts=("words",))


def ingest_batch_into_bloom_index(
    batch_df: DataFrame,
    index_path: str,
    epoch_id: int = 0,
    item_col: str = "item",
    m_bits: int = 63 * 1024,
    k_hashes: int = 4,
) -> bool:
    """OR ONE item batch into the filter (bootstrap build on first call).
    Returns False when the epoch was already applied (redelivery skip).
    ``m_bits``/``k_hashes`` apply to the bootstrap only; later epochs hash
    with the stored geometry from the validated meta.  Shared by the
    streaming sink below and manual incremental ingests."""
    spark = batch_df.sparkSession
    if epoch_id <= _read_last_epoch(spark, index_path):
        return False
    watermark = {"last_epoch": int(epoch_id)}
    if os.path.exists(f"{index_path}/meta"):
        bl.append_to_bloom_index(
            batch_df, index_path, item_col=item_col, extra_meta=watermark
        )
    else:
        bl.build_bloom_index(
            batch_df, index_path, item_col=item_col, m_bits=m_bits,
            k_hashes=k_hashes, extra_meta=watermark,
        )
    return True


def bloom_index_stream(
    stream_df: DataFrame,
    index_path: str,
    checkpoint_location: str | None = None,
    item_col: str = "item",
    m_bits: int = 63 * 1024,
    k_hashes: int = 4,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Maintain the Bloom filter from an append-only item stream.  See the
    module docstring for the exactly-once story; probes against
    ``index_path`` (``query_bloom_index``) see each epoch's items as soon
    as its word-table swap lands."""
    def process(batch_df: DataFrame, epoch_id: int) -> None:
        ingest_batch_into_bloom_index(
            batch_df, index_path, epoch_id, item_col=item_col,
            m_bits=m_bits, k_hashes=k_hashes,
        )

    return epoch_stream(
        stream_df, checkpoint_location, process, "bloom_index_stream",
        trigger_once=trigger_once,
    )
