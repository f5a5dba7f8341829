"""Persistent BM25 text index: build-once / query-many ranked retrieval.

A one-shot ``text.bm25_topk`` spends nearly all its CPU on the corpus pass
(tokenize → per-(doc, term) tf, document frequencies, lengths — 16 of 17
cpu-seconds at sf0.1); the scoring join against a query set is cheap.  At
100 TB you run that corpus pass ONCE, persist the sufficient statistics,
and every later query batch (quality retrieval, decontamination lookups,
eval-set leakage probes) joins the compact index instead of re-reading the
text.  This is the retrieval twin of the repo's other persisted artifacts —
the ANN index (operators/ann_index.py) and the dedup index
(operators/dedup_index.py) — with one crucial difference in its append
story: BM25's statistics are EXACT sufficient statistics, so appending
documents keeps queries exact for the grown corpus (df/avgdl re-derive from
the postings), where the ANN index's frozen codebooks approximate a drifted
distribution and need a drift gate.  No gate is needed here.

Layout under ``path/``:

- ``postings/`` parquet ``(doc_id long, w string, tf long, dl long)`` — one
                row per distinct (document, term); the only corpus-sized
                artifact, append-only, and the single source of truth;
- ``dfreq/``    parquet ``(w, df)`` — vocabulary-sized materialized view of
                the postings, refreshed on every append;
- ``meta/``     one-row parquet (format version, tokenizer id, n_docs,
                sum_dl) — validated on load like the manifests/indexes.

Two-commit note (same as ann_index/dedup_index): the postings append and
the dfreq/meta swaps are separate commits.  A crash in between leaves
dfreq/meta stale against the postings — new-vocabulary terms drop from the
scoring join and avgdl lags — degraded, not wrong-shaped, and the NEXT
append self-heals because dfreq/meta are always recomputed from the full
postings table (never incrementally merged, so no corruption compounds).

The reference has no text surface (it is a KV-compare tool); this module
is part of the LLM-data-pipeline extension mandated by the build brief.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from tikv_data_compare_spark.functions.fsutil import swap_commit

TEXT_INDEX_FORMAT_VERSION = 1

#: the tokenizer contract postings were built under; bump if the split rule
#: ever changes — postings from different tokenizers must never merge.
TOKENIZER = "split-space-v1"


def _write_meta(spark: SparkSession, path: str, meta: dict) -> None:
    swap_commit(
        spark.createDataFrame([tuple(meta.values())], list(meta.keys())),
        f"{path}/meta",
        coalesce=1,
    )


@dataclass
class TextIndex:
    """A loaded index: lazy postings + dfreq frames and the meta dict."""

    postings: DataFrame  # (doc_id, w, tf, dl)
    dfreq: DataFrame  # (w, df)
    meta: dict


def _postings(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    from tikv_data_compare_spark.operators.text import bm25_corpus_stats

    tf, _, _ = bm25_corpus_stats(docs, id_col, text_col)
    return tf.select(F.col("_id").alias("doc_id"), "w", "tf", "dl")


def _refresh_derived(spark: SparkSession, path: str, extra_meta: dict) -> dict:
    """Recompute dfreq + corpus counts from the WRITTEN postings (the single
    source of truth), swap them in, return the meta."""
    postings = spark.read.parquet(f"{path}/postings")
    swap_commit(
        postings.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("df")),
        f"{path}/dfreq",
    )
    counts = (
        postings.select("doc_id", "dl")
        .distinct()
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("sum_dl"),
        )
        .collect()[0]
    )
    meta = {
        "version": TEXT_INDEX_FORMAT_VERSION,
        "tokenizer": TOKENIZER,
        "n_docs": int(counts["n_docs"]),
        "sum_dl": int(counts["sum_dl"]),
        **extra_meta,
    }
    _write_meta(spark, path, meta)
    return meta


def build_text_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_meta: dict | None = None,
) -> dict:
    """Run the corpus pass once and persist the BM25 sufficient statistics
    under ``path``.  Returns the metadata dict.

    Scale shape: one tokenize+aggregate scan of the corpus; the postings
    write is the only large output (distinct (doc, term) rows — far smaller
    than the text for natural documents).  Fully distributed, no collect
    beyond the 1-row counts.  ``extra_meta`` rides in the meta swap (the
    streaming face threads its epoch watermark through it, the
    manifest/dedup-index pattern).
    """
    spark = docs.sparkSession
    swap_commit(_postings(docs, id_col, text_col), f"{path}/postings")
    return _refresh_derived(spark, path, dict(extra_meta or {}))


def load_text_index(spark: SparkSession, path: str) -> TextIndex:
    """Reopen a persisted index; postings/dfreq stay lazy parquet so query
    plans prune and push down into them.  Refuses a different format
    version or tokenizer (postings under different split rules must never
    merge), and an empty corpus (avgdl would divide by zero)."""
    metarows = spark.read.parquet(f"{path}/meta").collect()
    if len(metarows) != 1:
        raise ValueError(f"text index at {path!r} has a malformed meta table")
    meta = metarows[0].asDict()
    if meta.get("version") != TEXT_INDEX_FORMAT_VERSION:
        raise ValueError(
            f"text index format version {meta.get('version')} != supported "
            f"{TEXT_INDEX_FORMAT_VERSION} — rebuild the index"
        )
    if meta.get("tokenizer") != TOKENIZER:
        raise ValueError(
            f"text index tokenizer {meta.get('tokenizer')!r} != this build's "
            f"{TOKENIZER!r} — postings are not comparable, rebuild"
        )
    if int(meta.get("n_docs", 0)) < 1:
        raise ValueError(f"text index at {path!r} is empty (n_docs=0)")
    return TextIndex(
        postings=spark.read.parquet(f"{path}/postings"),
        dfreq=spark.read.parquet(f"{path}/dfreq"),
        meta=meta,
    )


def query_text_index(
    queries: DataFrame,
    path: str,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
) -> DataFrame:
    """BM25 top-k against the persisted corpus statistics — identical
    output, column-for-column and score-for-score, to running
    ``text.bm25_topk`` over the full corpus (contract-tested), because the
    index stores exact sufficient statistics and the scalars frame rebuilds
    ``avgdl`` with the very expression the one-shot path uses.

    Scale shape: the query-term table broadcasts into the postings join
    (only postings of matched terms leave the scan), dfreq and the 1-row
    scalars broadcast, the final window is bounded by candidates — the
    corpus text is never read.
    """
    from tikv_data_compare_spark.operators.text import bm25_rank

    spark = queries.sparkSession
    idx = load_text_index(spark, path)
    tf = idx.postings.select(F.col("doc_id").alias("_id"), "dl", "w", "tf")
    scalars = spark.createDataFrame(
        [(int(idx.meta["n_docs"]), int(idx.meta["sum_dl"]))], "n_docs long, sum_dl long"
    ).withColumn("avgdl", F.expr("CAST(sum_dl AS DOUBLE) / n_docs"))
    return bm25_rank(
        tf, idx.dfreq, scalars, queries,
        id_col="doc_id", query_id_col=query_id_col, query_text_col=query_text_col,
        k=k, k1=k1, b=b,
    )


def append_to_text_index(
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    on_collision: str = "fail",
    extra_meta: dict | None = None,
) -> int:
    """Add a batch's postings to the index and refresh the derived
    dfreq/meta, so queries immediately rank over the grown corpus with
    EXACT statistics (no drift — see module docstring).  Returns the
    number of documents appended; an empty batch is a no-op returning 0.

    Id collisions are REFUSED by default, not merely documented (stricter
    than the ANN/dedup index contract, deliberately): a re-appended
    document would duplicate its postings rows, silently doubling df above
    n_docs and flipping the idf NEGATIVE for common terms — observed
    corruption, not a hypothetical — so the batch's ids are checked
    against the indexed ids (one distinct column scan of the postings)
    before anything is written.  ``on_collision='skip'`` instead
    anti-joins already-indexed ids OUT of the batch and appends only the
    new ones — the id-keyed idempotence the streaming face needs (a
    redelivered half-committed epoch re-appends as a no-op); accidental
    overlap stays loud under the default.  ``extra_meta`` rides in the
    derived-meta swap (epoch watermark threading).
    """
    if on_collision not in ("fail", "skip"):
        raise ValueError(f"on_collision must be 'fail' or 'skip', got {on_collision!r}")
    spark = new_docs.sparkSession
    idx = load_text_index(spark, path)
    # persist: the batch postings plan (tokenize + two aggregations) feeds
    # the emptiness probe, the collision join AND the write — unpersisted
    # it would run the full aggregation three times per append (r10 review)
    raw = _postings(new_docs, id_col, text_col).persist()
    batch = raw
    try:
        if batch.limit(1).count() == 0:
            # a batch with no postings (e.g. all-NULL text) still commits
            # any threaded watermark — otherwise the streaming face would
            # report the epoch applied while last_epoch stayed behind and
            # a restart redelivered it (r10 review)
            if extra_meta:
                _refresh_derived(spark, path, dict(extra_meta))
            return 0
        indexed_ids = idx.postings.select("doc_id").distinct()
        if on_collision == "skip":
            # the anti-join reads the persisted raw postings — no re-agg
            batch = batch.join(indexed_ids, "doc_id", "left_anti")
            if batch.limit(1).count() == 0:
                # the whole batch was already indexed (redelivery): still
                # swap the meta so a lost watermark commit completes
                meta = _refresh_derived(spark, path, dict(extra_meta or {}))
                return 0
        else:
            n_coll = batch.select("doc_id").distinct().join(indexed_ids, "doc_id").count()
            if n_coll:
                raise ValueError(
                    f"append_to_text_index: {n_coll} batch ids already exist in the "
                    f"index at {path!r} — re-appending would duplicate postings and "
                    "corrupt df/idf; de-overlap the batch first (or pass "
                    "on_collision='skip' for id-keyed idempotent ingest)"
                )
        batch.write.mode("append").parquet(f"{path}/postings")
    finally:
        raw.unpersist()
    meta = _refresh_derived(spark, path, dict(extra_meta or {}))
    return int(meta["n_docs"]) - int(idx.meta["n_docs"])


def compact_text_index(
    spark: SparkSession, path: str, target_files: int | None = None
) -> dict:
    """Bounded, term-clustered rewrite of the appended ``postings/``
    fragments (``fsutil.compact_parquet_table`` — the ANN
    ``compact_index`` rationale).  Rankings are unchanged: identical
    postings rows, and the derived dfreq/meta are refreshed from the
    rewritten table through the same seam every append uses.  The meta's
    non-derived extras (epoch watermarks) are preserved."""
    from tikv_data_compare_spark.functions.fsutil import compact_parquet_table

    idx = load_text_index(spark, path)
    if target_files is None:
        target_files = max(1, spark.sparkContext.defaultParallelism)
    stats = compact_parquet_table(
        spark, f"{path}/postings", ["w"], int(target_files),
        sort_cols=["w", "doc_id"],
    )
    extras = {
        k: v
        for k, v in idx.meta.items()
        if k not in ("version", "tokenizer", "n_docs", "sum_dl")
    }
    extras["n_compactions"] = int(extras.get("n_compactions") or 0) + 1
    _refresh_derived(spark, path, extras)
    return {**stats, "n_compactions": extras["n_compactions"]}
