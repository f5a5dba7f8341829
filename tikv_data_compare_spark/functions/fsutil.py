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

from pyspark.sql import DataFrame


def swap_commit(df: DataFrame, final: str, coalesce: int | None = None) -> None:
    """Materialize ``df`` as parquet at ``final`` via write-then-swap.

    The swap is rename-aside, not rmtree-then-rename: the old directory is
    first renamed to ``.old`` (one atomic rename), the staged directory is
    renamed in (a second atomic rename), then the old copy is deleted.  A
    concurrent reader can therefore never observe partial rows, and the
    path-not-found window is the instant between the two renames — not the
    full duration of an ``rmtree`` (r8 ADVICE).  Crash-safe: a crash
    between the renames leaves ``.old`` recoverable by hand; a crash after
    leaves only a stale ``.old`` to garbage-collect (done eagerly below on
    the next commit).  This is crash-safety with a tiny unavailability
    window, not full atomicity — a production deployment swaps a
    transactional table format in at this seam.
    """
    stage = final.rstrip("/") + ".staging"
    old = final.rstrip("/") + ".old"
    writer = (df.coalesce(coalesce) if coalesce else df).write.mode("overwrite")
    writer.parquet(stage)
    if os.path.exists(old):  # stale leftover from a crashed prior commit
        shutil.rmtree(old)
    had_prior = os.path.exists(final)
    if had_prior:
        os.rename(final, old)
    os.rename(stage, final)
    if had_prior:
        shutil.rmtree(old)
