"""Persistent ANN index: build once, query many — the 100 TB ops flow.

A FAISS-style IVFPQ index persisted as plain parquet: the corpus is trained
and encoded ONCE into ``(vec_id, cell, pq_code)`` — m BYTES per vector —
and every later query batch joins against that compact table with no
re-training and no re-encoding.  At 100 TB this is the difference between
"every query batch re-reads and re-quantizes the corpus" and "query batches
read an index 250× smaller than the floats" (1024-dim float32 = 4 KB/vector
vs m=16 codes = 16 B/vector).

Layout under ``path/``:

- ``vectors/``    parquet ``(vec_id long, cell long, pq_code binary)`` —
                  the only corpus-sized artifact, m bytes/vector, readable
                  by any engine;
- ``codebooks/``  parquet ``(kind string, i long, j long, vals
                  array<double>)`` — the coarse centroids (``kind='cent'``,
                  one row per cell) and PQ codebooks (``kind='book'``, one
                  row per (subspace, code)); tiny (n_cells + m·k_codes
                  rows), collected to the driver at load;
- ``meta/``       one-row parquet of the build parameters (dim, n_cells,
                  m, k_codes, seed, sample_rows, format version) — the
                  compare-time validation that an index built with one
                  geometry is never queried with another (same contract as
                  the checksum manifests' ``expect_meta``).

The reference has no ANN surface (it is a KV-compare tool); this module is
part of the LLM-data-pipeline extension mandated by the build brief, and
its on-disk artifact mirrors what the reference DOES do for checksums —
persist a compact derived summary and reuse it instead of rescanning
(checksum manifests, operators/checksum.py:234+).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from tikv_data_compare_spark.operators.similarity import (
    _assign_encode,
    _ivfpq_join_topk,
    _track,
    _train_pq_from_rows,
    _train_sample_rows,
    resolve_n_probe,
)

INDEX_FORMAT_VERSION = 1


def _write_meta(spark: SparkSession, path: str, meta: dict) -> None:
    """Replace the one-row meta table via the shared write-then-swap seam
    (functions.fsutil.swap_commit): a plain mode('overwrite') deletes the
    directory before rewriting, so a concurrent ``load_ann_index`` could
    read zero/partial rows of a healthy index (r8 review)."""
    from tikv_data_compare_spark.functions.fsutil import swap_commit

    swap_commit(
        spark.createDataFrame([tuple(meta.values())], list(meta.keys())),
        f"{path}/meta",
        coalesce=1,
    )


@dataclass
class AnnIndex:
    """A loaded index: the lazy compact corpus frame + driver-side
    quantizers + the build metadata."""

    vectors: DataFrame  # (vec_id, cell, pq_code)
    centroids: "object"  # numpy (n_cells, dim)
    books: "object"  # numpy (m, k_codes, dim/m)
    meta: dict


def _pq_quant_mse(src: DataFrame, books, sample_rows: int) -> list:
    """Per-subspace mean squared quantization error of ``books`` over a
    bounded deterministic sample of ``src`` (the same content-hash sample
    recipe as train_pq — one driver collect of ≤ sample_rows rows).

    Vectors are L2-normalized first, matching what pq_encode actually
    quantizes.  This is the index's quality fingerprint: codebooks that fit
    the data have small per-subspace error; a distribution shift shows up
    as error inflation in exactly the subspaces that drifted.
    """
    import numpy as np

    rows = (
        src.select("embedding", F.xxhash64(F.col("embedding")).alias("_h"))
        .orderBy("_h")
        .limit(sample_rows)
        .collect()
    )
    rows = [r for r in rows if r["embedding"] is not None]
    if not rows:
        raise ValueError("cannot measure PQ quantization error on an empty frame")
    x = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    x /= norms
    books = np.asarray(books)
    m, _, sub_d = books.shape
    out = []
    for j in range(m):
        xj = x[:, j * sub_d : (j + 1) * sub_d]
        d2 = (
            (xj**2).sum(axis=1, keepdims=True)
            - 2.0 * (xj @ books[j].T)
            + (books[j] ** 2).sum(axis=1)[None, :]
        )
        out.append(float(np.maximum(d2.min(axis=1), 0.0).mean()))
    return out


def _codebook_rows(cent, books):
    rows = [("cent", int(i), 0, [float(v) for v in cent[i]]) for i in range(cent.shape[0])]
    m, kk, _ = books.shape
    rows += [
        ("book", int(j), int(c), [float(v) for v in books[j][c]])
        for j in range(m)
        for c in range(kk)
    ]
    return rows


def build_ann_index(
    emb: DataFrame,
    path: str,
    n_cells: int = 16,
    m: int = 8,
    k_codes: int = 32,
    sample_rows: int = 4096,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_meta: dict | None = None,
) -> dict:
    """Train the coarse quantizer + PQ codebooks (bounded seeded samples),
    encode the corpus in one map-side pass, and persist everything under
    ``path``.  Returns the metadata dict (also persisted).  ``extra_meta``
    rides in the meta table (the streaming face threads its epoch
    watermark through it — same pattern as the text/dedup indexes).

    Scale shape: the corpus is scanned twice (two bounded training collects
    share the first logical scan; the encode pass is the second) and never
    shuffled except the encode output write; everything else is
    driver-side numpy over ≤ ``sample_rows`` rows.
    """
    spark = emb.sparkSession
    src = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
    # one trainer sample collect + one fused assign+encode Arrow pass
    # (r18; byte-identical math — similarity._assign_encode): the build's
    # corpus scan crosses the Python boundary once instead of twice
    from tikv_data_compare_spark.operators.similarity import (
        _train_centroids_from_rows,
    )

    sample = _train_sample_rows(src, sample_rows, "embedding")
    cent = _train_centroids_from_rows(sample, n_cells, seed, "embedding")
    books = _train_pq_from_rows(sample, m, k_codes, seed, "embedding")
    cent_bc = _track(spark.sparkContext.broadcast(cent))
    books_bc = _track(spark.sparkContext.broadcast(books))
    vectors = _assign_encode(src, cent_bc, books_bc)
    vectors.write.mode("overwrite").parquet(f"{path}/vectors")
    spark.createDataFrame(
        _codebook_rows(cent, books), "kind string, i long, j long, vals array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")
    meta = {
        "version": INDEX_FORMAT_VERSION,
        "dim": int(cent.shape[1]),
        "n_cells": int(cent.shape[0]),
        "m": int(books.shape[0]),
        "k_codes": int(books.shape[1]),
        "sample_rows": int(sample_rows),
        "seed": int(seed),
        # counted from the WRITTEN parquet footers, not a plan re-execution
        "n_vectors": int(spark.read.parquet(f"{path}/vectors").count()),
        # build-time per-subspace PQ quantization error (bounded sample):
        # append_to_index compares appended rows against these bands, the
        # same meta-validation pattern as the checksum manifests
        "pq_mse": _pq_quant_mse(src, books, sample_rows),
        **dict(extra_meta or {}),
    }
    _write_meta(spark, path, meta)
    return meta


def load_ann_index(spark: SparkSession, path: str) -> AnnIndex:
    """Reopen a persisted index: meta + codebooks are collected (tiny); the
    vectors frame stays lazy parquet — query plans prune and push down into
    it like any other table."""
    import numpy as np

    metarows = spark.read.parquet(f"{path}/meta").collect()
    if len(metarows) != 1:
        raise ValueError(f"ANN index at {path!r} has a malformed meta table")
    meta = metarows[0].asDict()
    if meta.get("version") != INDEX_FORMAT_VERSION:
        raise ValueError(
            f"ANN index format version {meta.get('version')} != supported "
            f"{INDEX_FORMAT_VERSION}"
        )
    cb = spark.read.parquet(f"{path}/codebooks").collect()
    cent = np.zeros((meta["n_cells"], meta["dim"]))
    books = np.zeros((meta["m"], meta["k_codes"], meta["dim"] // meta["m"]))
    n_cent = n_book = 0
    for r in cb:
        if r["kind"] == "cent":
            cent[r["i"]] = r["vals"]
            n_cent += 1
        else:
            books[r["i"]][r["j"]] = r["vals"]
            n_book += 1
    if n_cent != meta["n_cells"]:
        raise ValueError(
            f"ANN index at {path!r} is corrupt: {n_cent} centroid rows for "
            f"{meta['n_cells']} cells"
        )
    # a truncated codebooks table would leave zero codebook entries and rank
    # candidates arbitrarily — fail loudly like the centroid path (r8 review)
    if n_book != meta["m"] * meta["k_codes"]:
        raise ValueError(
            f"ANN index at {path!r} is corrupt: {n_book} codebook rows for "
            f"m={meta['m']} × k_codes={meta['k_codes']}"
        )
    return AnnIndex(
        vectors=spark.read.parquet(f"{path}/vectors"),
        centroids=cent,
        books=books,
        meta=meta,
    )


def append_to_index(emb_new: DataFrame, path: str, id_col: str = "vec_id",
                    vec_col: str = "embedding", max_mse_ratio: float = 4.0,
                    on_drift: str = "fail", on_collision: str = "allow",
                    extra_meta: dict | None = None) -> int:
    """Encode NEW vectors with the index's FROZEN quantizers and append them
    (the standard FAISS add() flow: codebooks never retrain on append, so
    existing codes stay valid and the append is one map-side pass over the
    new rows only).  Returns the number of vectors appended.

    Quantization-drift gate: frozen codebooks encode a shifted distribution
    *silently worse* — codes stay valid but carry less information, which
    costs recall at selective probe with no error anywhere.  The gate
    measures the append sample's per-subspace quantization error against
    the build-time stats stored in the index meta (``pq_mse``) and trips
    when any subspace's error exceeds ``max_mse_ratio ×`` its build value:
    ``on_drift='fail'`` (default) raises ValueError before anything is
    written, ``'warn'`` emits a UserWarning and proceeds, ``'skip'``
    disables the gate.  Indexes built before the stats existed have no
    ``pq_mse`` and are not gated.

    Id collisions (``on_collision``): ``'allow'`` (default) keeps the
    FAISS add_with_ids contract — ids are the CALLER's responsibility and
    no check runs (zero extra IO; a duplicated id merely duplicates a
    candidate, it corrupts no global statistic, unlike the text index
    where a re-appended doc flips idf — hence the different default).
    ``'skip'`` anti-joins already-indexed ids out of the batch and appends
    only the new vectors — the id-keyed idempotence the streaming face
    needs (a redelivered half-committed epoch re-appends as a no-op); the
    join touches only the index's vec_id column (8 B/row) with the small
    batch side broadcast-able, so it scales.  ``'fail'`` checks the same
    way and raises on any overlap.  ``extra_meta`` rides in the meta swap
    (epoch watermark threading), and commits even when the whole batch
    skips out — completing a lost watermark is the point.

    Caller contract under ``'allow'``: ids must not collide with existing
    index ids (same as FAISS add_with_ids); exhaustive-probe + full-rerank
    queries remain EXACT regardless of how poorly the frozen codebooks fit
    the new data — codebook drift costs recall at selective probe, never
    correctness of the rerank contract.
    """
    import numpy as np

    if on_drift not in ("fail", "warn", "skip"):
        raise ValueError(f"on_drift must be 'fail', 'warn' or 'skip', got {on_drift!r}")
    if on_collision not in ("allow", "skip", "fail"):
        raise ValueError(
            f"on_collision must be 'allow', 'skip' or 'fail', got {on_collision!r}"
        )
    spark = emb_new.sparkSession
    idx = load_ann_index(spark, path)
    src = emb_new.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
    # validate EVERY row's dimension up front (one bounded agg over the
    # append set): a first-row-only probe lets a mixed-dim/NULL append
    # pass and die deep in the encode job with a raw executor traceback
    # instead of the documented clean ValueError (r8 review).  size(NULL)
    # is -1 under legacy sizeOfNull, so NULL embeddings are caught too.
    n_bad = src.filter(F.size("embedding") != idx.meta["dim"]).count()
    if n_bad:
        raise ValueError(
            f"append contains {n_bad} row(s) whose embedding dim != index "
            f"dim {idx.meta['dim']} — frozen quantizers cannot encode a "
            "different vector space"
        )
    persisted = None
    if on_collision == "fail":
        n_coll = (
            idx.vectors.select("vec_id")
            .join(F.broadcast(src.select("vec_id").distinct()), "vec_id")
            .count()
        )
        if n_coll:
            raise ValueError(
                f"append_to_index: {n_coll} batch id(s) already exist in the "
                f"index at {path!r} — de-overlap the batch first, or pass "
                "on_collision='skip' for id-keyed idempotent ingest"
            )
    elif on_collision == "skip":
        # anti-join out already-indexed ids; persist — the filtered frame
        # feeds the drift sample AND the encode pass
        src = src.join(
            idx.vectors.select("vec_id").distinct(), "vec_id", "left_anti"
        ).persist()
        persisted = src
    build_mse = idx.meta.get("pq_mse")
    # empty appends bypass the gate: there is no distribution to measure
    # and nothing an empty append can degrade — pipelines legitimately
    # append whatever a possibly-empty upstream filter yields (r9 ADVICE)
    if build_mse is not None and on_drift != "skip" and not src.isEmpty():
        new_mse = _pq_quant_mse(src, idx.books, idx.meta["sample_rows"])
        # a small absolute floor so a near-lossless build (mse ~ 0, e.g.
        # few distinct vectors) doesn't trip on numeric noise
        drifted = [
            (j, n, b)
            for j, (n, b) in enumerate(zip(new_mse, build_mse))
            if n > max(float(b) * max_mse_ratio, 1e-9)
        ]
        if drifted:
            j, n, b = max(drifted, key=lambda t: t[1] / max(t[2], 1e-12))
            msg = (
                f"append quantization drift: {len(drifted)}/{len(build_mse)} "
                f"subspace(s) exceed {max_mse_ratio}x the build-time error "
                f"(worst: subspace {j} mse {n:.3g} vs build {float(b):.3g}) — "
                "the frozen codebooks no longer fit the appended "
                "distribution; rebuild the index or pass on_drift='warn' to "
                "append anyway (recall at selective probe will degrade)"
            )
            if on_drift == "fail":
                raise ValueError(msg)
            import warnings

            warnings.warn(msg, UserWarning, stacklevel=2)
    cent_bc = _track(spark.sparkContext.broadcast(np.asarray(idx.centroids)))
    books_bc = _track(spark.sparkContext.broadcast(np.asarray(idx.books)))
    # fused assign+encode (r18) — identical (cell, code) per row, one
    # Arrow pass over the appended batch instead of two
    new_vecs = _assign_encode(src, cent_bc, books_bc)
    try:
        new_vecs.write.mode("append").parquet(f"{path}/vectors")
    finally:
        if persisted is not None:
            persisted.unpersist()
    n_total = spark.read.parquet(f"{path}/vectors").count()
    n_new = n_total - idx.meta["n_vectors"]
    # the vectors append and this meta swap are two commits: a crash
    # between them leaves a stale (under-)count that the NEXT append
    # self-heals (n_total is always recounted from the written files) —
    # append-only semantics make that safe; the swap itself is atomic
    _write_meta(
        spark, path,
        {**idx.meta, "n_vectors": int(n_total), **dict(extra_meta or {})},
    )
    return int(n_new)


def compact_index(
    spark: SparkSession,
    path: str,
    target_files: int | None = None,
) -> dict:
    """Rewrite the index's ``vectors/`` table into a bounded number of
    parquet files, CLUSTERED BY CELL (r13, VERDICT r12 task 7).

    ``append_to_index`` writes mode('append'), so a thousand-epoch stream
    accumulates a thousand small fragments — each query then pays a
    footer-read per fragment and the scan loses row-group pruning.
    Compaction is the standard LSM-style answer: one shuffle of the
    m-byte code table into ``target_files`` partitions hash-keyed and
    sorted by ``cell``, so (a) the file count is bounded regardless of
    epoch count and (b) each probed cell's codes live in contiguous row
    groups whose min/max stats let parquet skip everything else — the
    selective-probe scan reads ~n_probe/n_cells of the index instead of
    all of it.

    The rewrite lands via the shared write-then-swap seam
    (``fsutil.swap_commit``): a concurrent ``load_ann_index`` never sees
    partial rows, and a crash mid-commit leaves a recoverable ``.old``.
    Content is bit-identical (same rows, new layout), codebooks and
    geometry are untouched, so every query result is unchanged — the
    pytest contract is N appends + compact ≡ one-shot build.  The meta
    swap afterwards bumps ``n_compactions`` and re-counts ``n_vectors``
    from the written files (the append_to_index self-heal convention).

    ``target_files`` defaults to ~64 MB of (m + overhead) bytes per file,
    floor 1 — at 100 TB pass an explicit value sized to the cluster.
    Returns ``{files_before, files_after, n_vectors, n_compactions}``.
    """
    import math

    from tikv_data_compare_spark.functions.fsutil import compact_parquet_table

    idx = load_ann_index(spark, path)
    if target_files is None:
        rows_per_file = max(1, (64 << 20) // (int(idx.meta["m"]) + 16))
        target_files = max(1, math.ceil(idx.meta["n_vectors"] / rows_per_file))
    stats = compact_parquet_table(
        spark, f"{path}/vectors", ["cell"], int(target_files),
        sort_cols=["cell", "vec_id"],
    )
    meta = {
        **idx.meta,
        "n_vectors": stats["n_rows"],
        "n_compactions": int(idx.meta.get("n_compactions") or 0) + 1,
    }
    _write_meta(spark, path, meta)
    return {
        "files_before": stats["files_before"],
        "files_after": stats["files_after"],
        "n_vectors": stats["n_rows"],
        "n_compactions": meta["n_compactions"],
    }


def topk_index(
    index: AnnIndex,
    queries: DataFrame,
    k: int = 5,
    n_probe: "int | str" = 4,
    rerank: int = 0,
    emb_for_rerank: DataFrame | None = None,
    id_col: str = "query_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Top-k against a persisted index: the DataFrame-query IVFPQ join path
    (no collect ceiling) with the training/encode stages replaced by the
    index read.  ``rerank`` needs the float vectors, which the index
    deliberately does not store (they are the 250× the index exists to
    avoid shipping) — pass the original embeddings table as
    ``emb_for_rerank``; ids must match the index's vec_ids.

    ``exclude_self=True`` drops candidates whose vec_id equals the query
    id — correct when queries are index rows; for an external query set
    with an unrelated id space pass ``exclude_self=False`` (an id
    collision would otherwise silently hide a neighbor).
    """
    import numpy as np

    spark = queries.sparkSession
    # 'auto' sizes the probe from the index's OWN stored geometry — the
    # meta n_vectors count (maintained across appends) is exactly the
    # corpus-density input resolve_n_probe needs, no extra scan
    n_probe = resolve_n_probe(
        n_probe, index.meta["n_vectors"], index.meta["n_cells"], k=k, rerank=rerank
    )
    # geometry gate (first row — the wholesale-mismatch case; a mixed-dim
    # query set still fails in-executor, documented): without it a 32-dim
    # query against a 64-dim index dies as a raw numpy shape error deep in
    # mapInPandas instead of the meta-gated ValueError this module promises
    first = queries.select(F.size(vec_col).alias("d")).first()
    if first is not None and first["d"] != index.meta["dim"]:
        raise ValueError(
            f"query dim {first['d']} != index dim {index.meta['dim']} — an "
            "index built with one geometry cannot be queried with another"
        )
    cent_bc = _track(spark.sparkContext.broadcast(np.asarray(index.centroids)))
    books_bc = _track(spark.sparkContext.broadcast(np.asarray(index.books)))
    qdf = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_emb"))
    emb = (
        emb_for_rerank.select("vec_id", "embedding") if emb_for_rerank is not None else None
    )
    return _ivfpq_join_topk(
        emb, qdf, index.vectors, cent_bc, books_bc, k, n_probe, rerank, exclude_self
    )
