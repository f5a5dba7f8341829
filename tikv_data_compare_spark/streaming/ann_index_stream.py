"""Streaming maintenance of the persistent ANN index — the
continuous-ingest face of operators/ann_index.py (r12), completing the
pattern set: checksum manifests (manifest_stream), near-dup band tables
(dedup_stream), BM25 statistics (text_index_stream), and now the vector
index all maintain themselves from an append-only stream.

The first epoch BOOTSTRAPS the index (trains the coarse quantizer + PQ
codebooks on that batch's bounded sample); every later epoch appends
through ``append_to_index`` with the FROZEN quantizers — the FAISS add()
flow, one map-side encode pass over the new rows only, so ingest cost is
batch-sized, never corpus-sized.  The drift gate rides along: a batch
whose distribution the frozen codebooks no longer fit stops the stream
LOUDLY under ``on_drift='fail'`` (the default — a silently degrading
index is worse than a stopped stream; pass ``'warn'`` to log and keep
ingesting, then rebuild offline).

Exactly-once: ``foreachBatch`` may redeliver an epoch.  Two layers, the
text_index_stream pattern:

1. a ``last_epoch`` watermark in the index meta (threaded through
   ``extra_meta`` so it commits in the SAME meta swap as the vector
   counts): epochs ≤ it skip wholesale;
2. the append runs ``on_collision='skip'`` — already-indexed vec_ids
   anti-join out of the batch — so a redelivery inside the crash window
   (vectors appended, meta swap lost) re-appends as a no-op AND completes
   the lost meta swap.  Vector ids are therefore the idempotence key: the
   stream must carry stable ids (content-hash ids qualify).

``checkpoint_location`` is REQUIRED for the same reason as the sibling
streams: epoch ids are monotonic only per checkpoint, and a fresh
checkpoint re-lists every source file at epoch 0 — the watermark would
silently skip genuinely-new data.

Recall posture: codebooks are frozen from the FIRST epoch's sample, so
selective-probe recall on later data matches the batch append story (the
drift gate is the guard); exhaustive-probe + full-rerank queries stay
EXACT regardless — the rerank contract is unconditional.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from tikv_data_compare_spark.operators import ann_index as ai
from tikv_data_compare_spark.streaming.epochs import epoch_stream, read_last_epoch


def _read_last_epoch(spark, index_path: str) -> int:
    # shared scaffolding incl. crash-window .old recovery (streaming/epochs.py)
    return read_last_epoch(spark, index_path, parts=("vectors", "codebooks"))


def ingest_batch_into_ann_index(
    batch_df: DataFrame,
    index_path: str,
    epoch_id: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    on_drift: str = "fail",
    build_opts: dict | None = None,
) -> bool:
    """Fold ONE embedding batch into the index (bootstrap build on first
    call, frozen-codebook append after).  Returns False when the epoch was
    already applied (redelivery skip).  ``build_opts`` forwards geometry
    (``n_cells``/``m``/``k_codes``/``sample_rows``/``seed``) to the
    bootstrap build; later epochs inherit it from the index meta.  Shared
    by the streaming sink below and manual incremental ingests, mirroring
    ``text_index_stream.ingest_batch_into_text_index``."""
    spark = batch_df.sparkSession
    if epoch_id <= _read_last_epoch(spark, index_path):
        return False
    watermark = {"last_epoch": int(epoch_id)}
    if os.path.exists(f"{index_path}/meta"):
        ai.append_to_index(
            batch_df, index_path, id_col=id_col, vec_col=vec_col,
            on_drift=on_drift, on_collision="skip", extra_meta=watermark,
        )
    else:
        ai.build_ann_index(
            batch_df, index_path, id_col=id_col, vec_col=vec_col,
            extra_meta=watermark, **dict(build_opts or {}),
        )
    return True


def ann_index_stream(
    stream_df: DataFrame,
    index_path: str,
    checkpoint_location: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    on_drift: str = "fail",
    build_opts: dict | None = None,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Maintain the ANN index from an append-only embedding stream.  See
    the module docstring for the exactly-once story; queries against
    ``index_path`` (``load_ann_index`` + ``topk_index``) see each epoch's
    vectors as soon as its meta swap lands."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        ingest_batch_into_ann_index(
            batch_df, index_path, epoch_id, id_col=id_col, vec_col=vec_col,
            on_drift=on_drift, build_opts=build_opts,
        )

    return epoch_stream(
        stream_df, checkpoint_location, process, "ann_index_stream",
        trigger_once=trigger_once,
    )
