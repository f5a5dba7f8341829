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


def test_meter_keeps_cpu_of_autoreaped_children():
    """The r17 hole the stateful meter exists for: with SIGCHLD ignored
    (exactly what the pyspark daemon does to its workers), a dead child is
    auto-reaped by the kernel and its cpu is credited to NOBODY — the
    stateless tree scan loses it, the meter must not."""
    import os
    import signal

    meter = bench.ProcTreeCpuMeter()
    base = meter.sample()
    old = signal.signal(signal.SIGCHLD, signal.SIG_IGN)
    try:
        proc = subprocess.Popen([sys.executable, "-c", BURN])
        pid = proc.pid
        # poll while alive so the meter's last-seen reading tracks the burn
        deadline = time.time() + 30
        while os.path.exists(f"/proc/{pid}") and time.time() < deadline:
            meter.sample()
            time.sleep(0.05)
        assert not os.path.exists(f"/proc/{pid}"), "burner did not exit"
        after = meter.sample()
    finally:
        signal.signal(signal.SIGCHLD, old)
    delta = after - base
    # the child burned 1.0 cpu-s and was auto-reaped (no cutime anywhere);
    # the meter's departed tally must retain (almost all of) it
    assert delta >= 0.8, f"auto-reaped child's cpu vanished from the meter: {delta}"
    assert delta < 10.0, f"delta {delta} implausibly large for a 1s burn"
    # sanity: the meter never goes backwards
    assert meter.sample() >= after - 1e-9


def test_meter_counts_accounted_reap_exactly_once():
    """r18 ADVICE fix: a descendant that burns, exits, and is reaped WITH
    accounting (parent wait()s) must contribute ~1x its burn to the meter
    delta.  Before the fix the full scan summed cutime+cstime, so the
    child's cpu landed twice: once in the departed tally (last-seen) and
    again, forever, in our cutime — delta ~2x the burn."""
    import os

    meter = bench.ProcTreeCpuMeter()
    base = meter.sample()
    proc = subprocess.Popen([sys.executable, "-c", BURN])
    pid = proc.pid
    # poll while alive so the tally's last-seen reading tracks the burn
    deadline = time.time() + 30
    while proc.poll() is None and time.time() < deadline:
        meter.sample()
        time.sleep(0.05)
    proc.wait()  # accounted reap: child's cpu lands in OUR cutime
    assert not os.path.exists(f"/proc/{pid}") or proc.returncode is not None
    after = meter.sample()
    delta = after - base
    # burn = 1.0 cpu-s (+ small interpreter startup).  Double-counting
    # (tally + cutime) would put the delta at >= ~1.8; counted-once sits
    # near 1.0-1.3.  The ceiling is the finding's tripwire.
    assert delta >= 0.8, f"accounted-reaped child's cpu vanished: {delta}"
    assert delta < 1.7, f"accounted reap double-counted: delta {delta} ~ 2x burn"
    # monotone still holds
    assert meter.sample() >= after - 1e-9


def test_meter_resurrection_does_not_double_count():
    """A transient scan miss that 'resurrects' (same pid+starttime seen
    again) must be pulled back out of the departed tally — simulated by
    corrupting the meter's state the way a missed scan would."""
    meter = bench.ProcTreeCpuMeter()
    meter.sample()
    me = next(iter(meter._last))  # some live pid (ours)
    st, cpu = meter._last[me]
    # simulate: a scan missed this pid, so it was tallied as departed
    meter._departed[(me, st)] = cpu
    del meter._last[me]
    a = meter.sample()  # resurrection: pid is live again, tally must drop it
    assert (me, st) not in meter._departed
    b = meter.sample()
    assert abs(b - a) < 1.0, f"double-count after resurrection: {a} -> {b}"
