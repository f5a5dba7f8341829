"""Filesystem commit helpers shared by every persisted-artifact seam.

One implementation of the write-to-staging → swap pattern (checksum-manifest
triples, ANN-index meta): parquet cannot be overwritten in place while a
reader may be open on it, and a delete-before-rewrite leaves a window where
a concurrent reader sees zero/partial rows of a healthy artifact.  Local-FS
``os.rename`` of the staged directory is atomic; a production deployment
swaps a transactional table format in at THIS seam — keeping the seam
single-sourced means that hardening (fsync, cross-FS rename fallback, real
atomicity) lands once, not per module (r8 review).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, functions as F


def swap_commit(df: DataFrame, final: str, coalesce: int | None = None) -> None:
    """Materialize ``df`` as parquet at ``final`` via write-then-swap.

    The swap is rename-aside, not rmtree-then-rename: the old directory is
    first renamed to ``.old`` (one atomic rename), the staged directory is
    renamed in (a second atomic rename), then the old copy is deleted.  A
    concurrent reader can therefore never observe partial rows, and the
    path-not-found window is the instant between the two renames — not the
    full duration of an ``rmtree`` (r8 ADVICE).  Crash-safe: a crash
    between the renames leaves ``.old`` as the sole copy, which the NEXT
    commit restores (rename back to ``final``) before staging — never
    deletes (r9 ADVICE); a crash after the swap leaves only a stale
    ``.old`` that the next commit garbage-collects.  This is crash-safety with a tiny unavailability
    window, not full atomicity — a production deployment swaps a
    transactional table format in at this seam.
    """
    stage = final.rstrip("/") + ".staging"
    old = final.rstrip("/") + ".old"
    # Recovery runs on ENTRY, before the (possibly failing) staged write:
    if os.path.exists(old):
        if not os.path.exists(final):
            # Crash landed between the two renames of a prior commit: ``.old``
            # is the ONLY surviving copy.  Restore it instead of GC-ing it —
            # an eager rmtree here would destroy the artifact and make the
            # next reader treat the path as fresh state (r9 ADVICE medium).
            os.rename(old, final)
        else:  # stale leftover from a crash after the swap completed
            shutil.rmtree(old)
    writer = (df.coalesce(coalesce) if coalesce else df).write.mode("overwrite")
    writer.parquet(stage)
    had_prior = os.path.exists(final)
    if had_prior:
        os.rename(final, old)
    os.rename(stage, final)
    if had_prior:
        shutil.rmtree(old)


def compact_parquet_table(
    spark,
    table_path: str,
    cluster_cols: list[str],
    target_files: int,
    sort_cols: list[str] | None = None,
) -> dict:
    """Bounded, clustered rewrite of an append-accumulated parquet table —
    the shared engine of every index's ``compact_*`` face (r13, VERDICT
    r12 task 7).  ``mode('append')`` ingest leaves one fragment per epoch;
    this reshuffles the rows into ``target_files`` partitions hash-keyed
    on ``cluster_cols`` and sorted by ``sort_cols`` (default: the cluster
    columns), so the file count is bounded and each key's rows land in
    contiguous row groups whose min/max stats enable pruning.  Content is
    bit-identical (same rows, new layout); the rewrite lands through
    :func:`swap_commit`, so concurrent readers never observe partial rows.

    Returns ``{files_before, files_after, n_rows}``.
    """
    if target_files < 1:
        raise ValueError(f"target_files must be >= 1, got {target_files}")
    df = spark.read.parquet(table_path)
    files_before = len(df.inputFiles())
    shaped = df.repartition(
        int(target_files), *[F.col(c) for c in cluster_cols]
    ).sortWithinPartitions(*(sort_cols or cluster_cols))
    swap_commit(shaped, table_path)
    out = spark.read.parquet(table_path)
    return {
        "files_before": int(files_before),
        "files_after": len(out.inputFiles()),
        "n_rows": int(out.count()),
    }


def scratch_dir(prefix: str) -> str:
    """``tempfile.mkdtemp`` with process-exit cleanup: registry rows and
    bench entries build scratch indexes/dumps/sinks per invocation, and
    bare mkdtemp leaked one directory (sometimes a full parquet index) per
    call across repeated gate/bench runs (r10 review).  atexit — not
    eager deletion — because the returned DataFrames read these paths
    lazily until the caller's final action."""
    import atexit
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, True)
    return d


def recover_swap(path: str) -> bool:
    """Entry recovery for readers that check a swap-committed artifact's
    EXISTENCE before any ``swap_commit`` runs (the streaming
    bootstrap-vs-append dispatch): a crash between swap_commit's two
    renames leaves ``path.old`` as the sole copy, and a bare existence
    check would then mis-dispatch — a bootstrap over a half-swapped index
    silently discards everything previously ingested, and an append path
    would throw path-not-found on every retry.  Same restore rule as
    swap_commit's own entry recovery (rename back, never delete); returns
    whether the artifact exists afterwards."""
    clean = path.rstrip("/")
    old = clean + ".old"
    if os.path.exists(old) and not os.path.exists(clean):
        os.rename(old, clean)
    return os.path.exists(clean)
