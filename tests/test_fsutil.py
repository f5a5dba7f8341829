"""swap_commit crash-recovery contracts: the .old rename-aside copy must be
restored — never GC'd — when a crash left it as the sole surviving copy."""

import os
import shutil

import pytest

from tikv_data_compare_spark.functions.fsutil import swap_commit


@pytest.fixture()
def one_row(spark):
    def make(v):
        return spark.createDataFrame([(v,)], ["v"])

    return make


def _read_vals(spark, path):
    return sorted(r["v"] for r in spark.read.parquet(path).collect())


def test_swap_commit_overwrites(spark, one_row, tmp_path):
    final = os.path.join(str(tmp_path), "t")
    swap_commit(one_row(1), final, coalesce=1)
    swap_commit(one_row(2), final, coalesce=1)
    assert _read_vals(spark, final) == [2]
    assert not os.path.exists(final + ".old")
    assert not os.path.exists(final + ".staging")


def test_crash_between_renames_is_restored_not_gced(spark, one_row, tmp_path):
    """Simulate a crash between os.rename(final, old) and
    os.rename(stage, final): final absent, .old the only copy.  The next
    commit must restore .old (r9 ADVICE medium) — before the fix it
    rmtree'd the sole surviving copy and the artifact history was silently
    reset."""
    final = os.path.join(str(tmp_path), "t")
    swap_commit(one_row(1), final, coalesce=1)
    os.rename(final, final + ".old")  # the crash window state
    assert not os.path.exists(final)
    swap_commit(one_row(2), final, coalesce=1)
    # the new commit lands; nothing was lost in the meantime and the
    # recovery path never deleted the only copy
    assert _read_vals(spark, final) == [2]
    assert not os.path.exists(final + ".old")


def test_restore_fires_on_entry_even_when_the_new_write_fails(spark, tmp_path):
    """The restore precedes the staged write, so a commit whose DataFrame
    fails at execution still leaves the artifact readable again — this is
    what distinguishes restore-then-overwrite from the old
    rmtree-then-overwrite (both look identical after a SUCCESSFUL
    commit)."""
    from pyspark.sql import functions as F

    final = os.path.join(str(tmp_path), "t")
    swap_commit(spark.createDataFrame([(42,)], ["v"]), final, coalesce=1)
    os.rename(final, final + ".old")  # crash-window state: .old is sole copy
    failing = spark.range(1).select(F.expr("raise_error('boom')").alias("v"))
    with pytest.raises(Exception):
        swap_commit(failing, final, coalesce=1)
    assert _read_vals(spark, final) == [42]  # restored, not rmtree'd
    assert not os.path.exists(final + ".old")


def test_stale_old_with_final_present_is_gced(spark, one_row, tmp_path):
    """A crash AFTER the swap leaves final valid + stale .old; the next
    commit garbage-collects the stale copy, not the live one."""
    final = os.path.join(str(tmp_path), "t")
    swap_commit(one_row(1), final, coalesce=1)
    shutil.copytree(final, final + ".old")  # stale leftover
    swap_commit(one_row(2), final, coalesce=1)
    assert _read_vals(spark, final) == [2]
    assert not os.path.exists(final + ".old")
