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
    """Materialize ``df`` as parquet at ``final`` via write-then-swap."""
    stage = final.rstrip("/") + ".staging"
    writer = (df.coalesce(coalesce) if coalesce else df).write.mode("overwrite")
    writer.parquet(stage)
    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(stage, final)
