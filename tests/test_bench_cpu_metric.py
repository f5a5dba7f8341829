"""Invariants of bench.py's proc_tree_cpu_sec (r17, VERDICT r16 task 3).

The metric attributes per-entry cpu to THIS process tree by walking
/proc ppid chains.  Its r16 hole: a child that exits (and is reaped)
between the two samples takes its utime with it out of the live sum —
the delta went NEGATIVE on the sf1 tfidf entry (BENCH_sf1_r16 shipped
tfidf = -32.02).  The fix accumulates cutime/cstime (cpu of reaped
children, credited to the parent at reap time).  These tests pin:

1. a child that burns cpu and EXITS mid-window still shows up in the
   delta (>= 0 and ~= the burn), and
2. monotonicity: back-to-back samples never decrease under quiet load.
"""

from __future__ import annotations

import subprocess
import sys
import time

import bench


BURN = r"""
import time
t0 = time.process_time()
while time.process_time() - t0 < 1.0:
    sum(i * i for i in range(10000))
"""


def test_reaped_child_cpu_is_not_lost():
    """Burn ~1 cpu-s in a subprocess that exits (and is reaped via wait())
    INSIDE the measurement window: the delta must be >= 0 — the r16
    failure mode was a negative delta — and must be ~ the burn, i.e. the
    reaped child's cpu landed in cutime instead of vanishing."""
    p0 = bench.proc_tree_cpu_sec()
    proc = subprocess.Popen([sys.executable, "-c", BURN])
    proc.wait()  # child fully reaped -> its utime now lives in OUR cutime
    p1 = bench.proc_tree_cpu_sec()
    delta = p1 - p0
    assert delta >= 0.0, f"impossible negative cpu delta {delta}"
    # the burn is 1.0 process-cpu-s; allow wide slack for interpreter
    # startup (adds cpu, fine) but require most of the burn to be visible
    assert delta >= 0.8, f"reaped child's cpu vanished from the delta: {delta}"
    # sanity ceiling: nothing else in this tree should burn 10x the child
    assert delta < 10.0, f"delta {delta} implausibly large for a 1s burn"


def test_proc_tree_cpu_monotone_under_quiet_load():
    """Two samples with only trivial work between them: the counter must
    never tick backwards (it is a cumulative sum of monotone counters)."""
    a = bench.proc_tree_cpu_sec()
    time.sleep(0.05)
    b = bench.proc_tree_cpu_sec()
    assert b >= a - 1e-9, f"cpu counter went backwards: {a} -> {b}"
