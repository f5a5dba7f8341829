"""Streaming comparison operators.

The reference is batch-only (SURVEY.md §2.7: no streaming surface), so this
module is an extension: the same keyed-diff/checksum semantics applied
incrementally with Structured Streaming.

- ``diff_stream``: micro-batch keyed diff of a streaming source against a
  static reference table via ``foreachBatch`` (the engine's batch ``diff``
  reused verbatim — exactly-once per epoch when the sink is idempotent).
- ``windowed_counts``: event-time tumbling-window aggregation with a
  watermark for late data.

Scale notes: foreachBatch reuses the batch operators, so every scale
property (broadcast small side, partial agg, AQE) carries over per
micro-batch; state size for the windowed agg is bounded by the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from tikv_data_compare_spark.model import Keyed
from tikv_data_compare_spark.operators.diff import diff


def diff_stream(
    stream_df: DataFrame,
    reference: Keyed,
    keys: tuple[str, ...],
    on_batch,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Incrementally diff a stream of rows against a static reference.

    ``on_batch(findings_df, epoch_id)`` receives the keyed-diff findings of
    each micro-batch (the micro-batch is treated as the dst side restricted
    to the keys it contains — arriving rows are upserts; missing keys are
    not deletions, so only changed/only_dst statuses can appear per batch).
    """

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_keyed = Keyed.of(batch_df, keys=keys)
        ref_restricted = Keyed.of(
            reference.df.join(batch_df.select(*keys).distinct(), on=list(keys), how="left_semi"),
            keys=keys,
        )
        findings = diff(ref_restricted, batch_keyed)
        on_batch(findings, epoch_id)

    writer = stream_df.writeStream.foreachBatch(process).outputMode("update")
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time tumbling-window counts per event_type with a watermark
    bounding state (late rows beyond the watermark are dropped)."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.expr(f"CAST(ROUND(value * 10000) AS BIGINT)")).alias("sum_value_c"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value_c",
        )
    )
