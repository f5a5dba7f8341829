"""Persistent MinHash-LSH dedup index: incremental near-dup at corpus scale.

At 100 TB you do not re-dedup the whole corpus on every ingest.  This module
persists the corpus's LSH band keys ONCE — ``n_bands`` rows × ~(8·r + 16) B
per document, orders of magnitude smaller than the text — and each new batch
then:

1. computes its OWN band keys map-side (the same zero-shuffle array-HOF
   signature pass as ``dedup.minhash_pairs`` — signatures are a pure
   per-document function, so batch keys and stored keys are directly
   comparable regardless of when either side was computed);
2. equi-joins them against the stored band table → candidate
   ``(new, indexed)`` pairs.  This is the ONLY shuffle, keyed on
   ``(band, hkey)`` exactly like the batch self-join — hot buckets
   (giant near-dup clusters) remain the AQE skew-join case;
3. optionally appends its own band keys (:func:`append_to_dedup_index`),
   so the NEXT batch dedups against everything ingested so far.

The LSH geometry ``(n_bands, rows_per_band)`` is a BUILD parameter (r10):
the candidate threshold of r×b banding is ≈ ``(1/b)^(1/r)``, so a corpus
operator tunes both — 4×2 (the default, threshold ≈ 0.5) casts a wide
recall net; 2×4 (threshold ≈ 0.84) is the "near-verbatim only" setting a
100 TB pipeline typically wants.  The geometry lands in the meta at build
time and EVERY later pass (query, append, streaming ingest) derives its
signature/band computation from the meta — a batch can never be banded
with a different geometry, or hashed with a different algorithm, than the
corpus it probes.  Signatures beyond the 8 frozen permutations extend
deterministically (``dedup.minhash_perms``), so a later session reproduces
the same keys.

Candidates feed the same exact-Jaccard verify as the batch path
(``dedup.jaccard_for_pairs``) — the index stores no text, by design: at
scale the band table is the only artifact small enough to keep hot, and
the verify stage reads the two candidate documents' shingles from wherever
the corpus lives (the candidate set is LSH-pruned, so those joins are
broadcast-sized).

The on-disk artifact mirrors the repo's other persisted summaries — the
ANN index (operators/ann_index.py) and the checksum manifests
(operators/checksum.py:234+): a compact derived table plus a one-row meta
table holding the build parameters, validated on every load/query/append
so band keys from different hash algorithms, band geometries, or a future
format can never silently merge (the manifests' algo-gate contract).

Layout under ``path/``:

- ``bands/``  parquet ``(doc_id long, band int, hkey array<long>)`` — the
              only corpus-sized artifact; append-only; ``hkey`` is the
              exact array of the band's ``rows_per_band`` permutation
              minima (no lossy fold — two docs share a band iff every
              element matches);
- ``meta/``   one-row parquet (format version, shingle-hash algo, band
              geometry, minhash modulus, doc count).

The reference has no dedup surface (it is a KV-compare tool); this module
is part of the LLM-data-pipeline extension mandated by the build brief.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from tikv_data_compare_spark.functions.fsutil import swap_commit
from tikv_data_compare_spark.operators.dedup import (
    _check_algo,
    band_key_rows,
    minhash_signatures,
)

#: v2 (r10): band table keyed by ``hkey array<long>`` instead of the fixed
#: (h1, h2) pair, geometry (n_bands, rows_per_band) parameterized at build
#: and recorded in the meta.  v1 indexes (fixed 4×2, h1/h2 columns) are
#: refused at load — rebuild, the band table is cheap by construction.
DEDUP_INDEX_FORMAT_VERSION = 2
_DEFAULT_N_BANDS = 4
_DEFAULT_ROWS_PER_BAND = 2


def _write_meta(spark: SparkSession, path: str, meta: dict) -> None:
    """One-row meta table via the shared write-then-swap seam, so a
    concurrent load never reads a half-written meta (same rationale as
    ann_index._write_meta)."""
    swap_commit(
        spark.createDataFrame([tuple(meta.values())], list(meta.keys())),
        f"{path}/meta",
        coalesce=1,
    )


@dataclass
class DedupIndex:
    """A loaded index: the lazy band table + the build metadata."""

    bands: DataFrame  # (doc_id, band, hkey)
    meta: dict


def band_table(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    algo: str = "md5i64",
    n_bands: int = _DEFAULT_N_BANDS,
    rows_per_band: int = _DEFAULT_ROWS_PER_BAND,
) -> DataFrame:
    """``(doc_id, band, hkey)`` LSH band keys of each document — one
    map-side pass (array-HOF shingle hashing + per-permutation array_min +
    an ``n_bands``-element explode), no shuffle.  Documents whose shingle
    hashes are NULL under ``algo`` (NULL text with md5i64) get NULL hkey
    elements, which never match an equi-join — identical to the batch
    self-join semantics.
    """
    sig = minhash_signatures(
        docs, id_col, text_col, algo, n_perms=n_bands * rows_per_band
    )
    return band_key_rows(sig, id_col, n_bands, rows_per_band).select(
        F.col(id_col).alias("doc_id"), "band", "hkey"
    )


def build_dedup_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    algo: str = "md5i64",
    n_bands: int = _DEFAULT_N_BANDS,
    rows_per_band: int = _DEFAULT_ROWS_PER_BAND,
    extra_meta: dict | None = None,
) -> dict:
    """Compute the corpus's band table in one map-side pass and persist it
    (plus the meta) under ``path``.  Returns the metadata dict.

    ``extra_meta`` rides along in the SAME meta swap (the streaming ingest
    threads its ``last_epoch`` watermark through here so watermark and
    doc count commit atomically — r9 ADVICE); keys must not collide with
    the built-in ones.

    Scale shape: the corpus is scanned once; the only write is the band
    table (``n_bands`` small rows/doc).  No collect anywhere — the index
    build is fully distributed, unlike the ANN index whose quantizer
    training needs a bounded driver sample.

    Both tables go through the write-then-swap seam, so a concurrent
    reader never sees a half-written directory.  Bands and meta are still
    TWO commits: a crash between them during an in-place REBUILD leaves
    new bands under the old meta (e.g. a stale ``algo``), which load-time
    validation cannot detect — rebuild to a fresh path and switch readers
    over instead of rebuilding in place (the ann_index/manifest two-commit
    note, same remedy).
    """
    from tikv_data_compare_spark.queries import MINHASH_P

    _check_algo(algo)
    if n_bands < 1 or rows_per_band < 1:
        raise ValueError(
            f"band geometry must be positive, got {n_bands}×{rows_per_band}"
        )
    spark = docs.sparkSession
    swap_commit(
        band_table(docs, id_col, text_col, algo, n_bands, rows_per_band),
        f"{path}/bands",
    )
    meta = {
        "version": DEDUP_INDEX_FORMAT_VERSION,
        "algo": algo,
        "n_perms": int(n_bands * rows_per_band),
        "n_bands": int(n_bands),
        "rows_per_band": int(rows_per_band),
        "minhash_p": int(MINHASH_P),
        # counted from the WRITTEN parquet, not a plan re-execution
        "n_docs": int(
            spark.read.parquet(f"{path}/bands").select("doc_id").distinct().count()
        ),
        **(extra_meta or {}),
    }
    _write_meta(spark, path, meta)
    return meta


def load_dedup_index(spark: SparkSession, path: str) -> DedupIndex:
    """Reopen a persisted index: meta is collected (one row); the band
    table stays lazy parquet so query plans prune and push down into it.

    Validation refuses what must never silently merge: a different format
    version (v1's (h1, h2) band table is not ``hkey``-joinable), an
    internally-inconsistent geometry (n_perms ≠ bands·rows — a corrupt or
    hand-edited meta), or a different minhash modulus.  The geometry
    itself is NOT pinned to a module constant — query/append derive their
    signature pass from the meta, so any self-consistent geometry loads.
    """
    from tikv_data_compare_spark.queries import MINHASH_P

    metarows = spark.read.parquet(f"{path}/meta").collect()
    if len(metarows) != 1:
        raise ValueError(f"dedup index at {path!r} has a malformed meta table")
    meta = metarows[0].asDict()
    if meta.get("version") != DEDUP_INDEX_FORMAT_VERSION:
        raise ValueError(
            f"dedup index format version {meta.get('version')} != supported "
            f"{DEDUP_INDEX_FORMAT_VERSION}"
        )
    nb, rpb = meta.get("n_bands"), meta.get("rows_per_band")
    if not nb or not rpb or meta.get("n_perms") != nb * rpb:
        raise ValueError(
            f"dedup index at {path!r} has inconsistent band geometry: "
            f"n_perms={meta.get('n_perms')} vs {nb}×{rpb} — refusing to join "
            "band keys of unknown provenance"
        )
    if meta.get("minhash_p") != int(MINHASH_P):
        raise ValueError(
            f"dedup index at {path!r} was built with minhash modulus "
            f"{meta.get('minhash_p')}, this build uses {int(MINHASH_P)} — "
            "signatures are not comparable"
        )
    return DedupIndex(bands=spark.read.parquet(f"{path}/bands"), meta=meta)


def query_dedup_index(
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Candidate near-dup pairs between a NEW batch and the indexed corpus:
    ``(new_id, indexed_id)`` distinct pairs sharing ≥1 LSH band.  The
    shingle-hash algorithm AND the band geometry come from the index meta —
    a batch can never be hashed or banded differently from the corpus it
    probes.

    Semantics match the batch self-join (at the index's geometry)
    restricted to cross pairs: because signatures are per-document pure
    functions, querying batch B against an index of corpus A yields exactly
    ``minhash_pairs(A ∪ B)`` filtered to one-side-in-B pairs
    (contract-tested).  Intra-batch duplicates are the ordinary
    ``minhash_pairs(B)`` self-join, run separately if wanted.

    A document present in BOTH sides (same id) never pairs with itself;
    distinct ids carrying identical text verify at Jaccard 10000 like any
    exact duplicate.  Feed the result to ``dedup.jaccard_for_pairs`` for
    the exact verify.
    """
    spark = new_docs.sparkSession
    idx = load_dedup_index(spark, path)
    qb = band_table(
        new_docs, id_col, text_col, idx.meta["algo"],
        idx.meta["n_bands"], idx.meta["rows_per_band"],
    ).select(F.col("doc_id").alias("new_id"), "band", "hkey")
    ib = idx.bands.select(F.col("doc_id").alias("indexed_id"), "band", "hkey")
    return (
        qb.join(ib, on=["band", "hkey"])
        .filter(F.col("new_id") != F.col("indexed_id"))
        .select("new_id", "indexed_id")
        .distinct()
    )


def append_to_dedup_index(
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_meta: dict | None = None,
) -> int:
    """Add a batch's band keys to the index (one map-side pass + an
    append-only parquet write), so later batches dedup against it.  Returns
    the number of documents appended.  The algo AND geometry come from the
    meta, so appended keys are always comparable with the stored ones;
    ``extra_meta`` rides in the meta swap (watermark threading, see
    :func:`build_dedup_index`).

    Caller contract: ids must not collide with indexed ids (same as the ANN
    index's append) — a re-appended id would duplicate its band rows, which
    is harmless for candidate *correctness* (query() is distinct) but
    double-counts ``n_docs``.

    The bands append and the meta swap are two commits: a crash between
    them leaves a stale (under-)count that the NEXT append's recount fixes
    — append-only semantics make that safe (same note as ann_index).
    """
    spark = new_docs.sparkSession
    idx = load_dedup_index(spark, path)
    band_table(
        new_docs, id_col, text_col, idx.meta["algo"],
        idx.meta["n_bands"], idx.meta["rows_per_band"],
    ).write.mode("append").parquet(f"{path}/bands")
    n_total = int(
        spark.read.parquet(f"{path}/bands").select("doc_id").distinct().count()
    )
    _write_meta(spark, path, {**idx.meta, "n_docs": n_total, **(extra_meta or {})})
    return n_total - int(idx.meta["n_docs"])


def compact_dedup_index(
    spark: SparkSession, path: str, target_files: int | None = None
) -> dict:
    """Bounded, band-clustered rewrite of the appended ``bands/`` fragments
    (``fsutil.compact_parquet_table`` — see the ANN index's
    ``compact_index`` for the rationale; thousand-epoch streams otherwise
    accumulate one file per epoch).  Candidate results are unchanged:
    same rows, new layout.  ``target_files`` defaults to the session's
    parallelism, floored at 1."""
    from tikv_data_compare_spark.functions.fsutil import compact_parquet_table

    idx = load_dedup_index(spark, path)
    if target_files is None:
        target_files = max(1, spark.sparkContext.defaultParallelism)
    stats = compact_parquet_table(
        spark, f"{path}/bands", ["band", "hkey"], int(target_files)
    )
    n_comp = int(idx.meta.get("n_compactions") or 0) + 1
    _write_meta(spark, path, {**idx.meta, "n_compactions": n_comp})
    return {**stats, "n_compactions": n_comp}
