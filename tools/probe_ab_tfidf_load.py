#!/usr/bin/env python
"""A/B probe for the r15 tfidf cpu_sec drift (VERDICT r15 task 3).

Question: BENCH_r15 recorded tfidf cpu_sec 6.5 → 14.4 (2.22×) with no code
change, under ambient load — undermining the "cgroup cpu is
contention-proof" attribution doctrine.  Hypothesis: the cgroup counter
(`/sys/fs/cgroup/cpu.stat usage_usec`) is CONTAINER-wide — it sums every
process in the container, so a sibling process burning CPU during a timed
run (the judge's probe load, a concurrent pytest, another tool) inflates
the per-query delta even though the bench's own work is unchanged.

Experiment (same session, same plan, back-to-back):
  A. tfidf min-of-3 at ambient load — cgroup delta vs process-TREE delta
     (sum of utime+stime for this python driver + its JVM descendants,
     from /proc — counts only OUR work by construction).
  B. the same with N_BURN sibling spin processes running in this
     container (started by this probe, killed after) — pure external-to-
     the-JVM load, zero extra bench work.

Read: if B's cgroup delta ≈ A's cgroup delta + burner cpu while B's
proc-tree delta stays ≈ A's, the doctrine hole is proven and per-query
cpu attribution must use the process-tree metric (bench.py now records
both).  Any residual proc-tree inflation in B is the true
contention-inefficiency term (SMT/LLC sharing), measured separately.

Output: one JSON line per phase.
"""

from __future__ import annotations

import json
import multiprocessing
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BURN = 8
BURN_SECS = 0  # killed explicitly; 0 = spin until terminated


def _spin():
    x = 1.0
    while True:
        x = x * 1.0000001 + 1e-9
        if x > 1e12:
            x = 1.0


def cgroup_cpu_sec() -> float:
    try:
        with open("/sys/fs/cgroup/cpuacct/cpuacct.usage") as f:
            return int(f.read()) / 1e9
    except (OSError, ValueError):
        pass
    try:
        with open("/sys/fs/cgroup/cpu.stat") as f:
            for line in f:
                if line.startswith("usage_usec"):
                    return int(line.split()[1]) / 1e6
    except (OSError, ValueError):
        pass
    return -1.0


def proc_tree_cpu_sec(
    root_pid: int | None = None, exclude: "set[int] | None" = None
) -> float:
    """utime+stime of root_pid (default: this process) and every live
    descendant, via /proc — immune to sibling-process pollution.

    ``exclude``: pids whose subtrees are NOT counted even when they
    descend from root (this probe's own in-tree burner processes; the
    first probe run counted them and masked the very distinction being
    measured)."""
    root = root_pid or os.getpid()
    exclude = exclude or set()
    ppid_map: dict[int, int] = {}
    cpu: dict[int, float] = {}
    hz = os.sysconf("SC_CLK_TCK")
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                raw = f.read()
        except OSError:
            continue
        # comm may contain spaces/parens: split after the LAST ')'
        rest = raw.rsplit(")", 1)[1].split()
        pid = int(d)
        ppid_map[pid] = int(rest[1])
        # incl. cutime/cstime: reaped-child cpu accumulates to the parent,
        # keeping the tree total monotonic when workers die mid-measurement
        cpu[pid] = (
            int(rest[11]) + int(rest[12]) + int(rest[13]) + int(rest[14])
        ) / hz
    total = 0.0
    for pid in cpu:
        p = pid
        seen = set()
        while p > 1 and p not in seen:
            if p in exclude:
                break
            if p == root:
                total += cpu[pid]
                break
            seen.add(p)
            p = ppid_map.get(p, 1)
    return total


def loadavg_1m() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def measure(fn, n=3, exclude=None):
    import gc

    best = None
    out = {}
    runs = []
    for _ in range(n):
        gc.collect()
        c0, p0 = cgroup_cpu_sec(), proc_tree_cpu_sec(exclude=exclude)
        t0 = time.time()
        fn()
        dt = time.time() - t0
        runs.append(round(dt, 3))
        if best is None or dt < best:
            best = dt
            out = {
                "cgroup_cpu": round(cgroup_cpu_sec() - c0, 3),
                "proc_cpu": round(proc_tree_cpu_sec(exclude=exclude) - p0, 3),
            }
    out.update({"wall": round(best, 3), "runs": runs})
    return out


def main():
    import bench
    from tikv_data_compare_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe_ab_tfidf", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    benches = bench.build_benches(spark, sf_dir)
    fn = lambda: bench.run_forced(benches["tfidf"]())  # noqa: E731
    fn()  # warm codegen/JIT

    a = measure(fn)
    a.update({"phase": "A_ambient", "loadavg": loadavg_1m()})
    print(json.dumps(a), flush=True)

    burners = [multiprocessing.Process(target=_spin, daemon=True) for _ in range(N_BURN)]
    burn_c0 = cgroup_cpu_sec()
    burn_t0 = time.time()
    for b in burners:
        b.start()
    burn_pids = {b.pid for b in burners}
    try:
        bres = measure(fn, exclude=burn_pids)
    finally:
        for b in burners:
            b.terminate()
        for b in burners:
            b.join()
    burn_wall = time.time() - burn_t0
    bres.update({
        "phase": "B_sibling_burn",
        "loadavg": loadavg_1m(),
        "n_burn": N_BURN,
        # total container cpu over the burn window minus what phase-B's
        # bench runs burned — approximately the burners' own cpu
        "burn_window_cgroup_cpu": round(cgroup_cpu_sec() - burn_c0, 3),
        "burn_window_wall": round(burn_wall, 3),
    })
    print(json.dumps(bres), flush=True)
    verdict = {
        "phase": "verdict",
        "cgroup_inflation": round(bres["cgroup_cpu"] - a["cgroup_cpu"], 3),
        "proc_inflation": round(bres["proc_cpu"] - a["proc_cpu"], 3),
        "doctrine_hole_proven": bool(
            bres["cgroup_cpu"] > 1.5 * max(a["cgroup_cpu"], 0.001)
            and bres["proc_cpu"] < 1.5 * max(a["proc_cpu"], 0.001)
        ),
    }
    print(json.dumps(verdict), flush=True)


if __name__ == "__main__":
    main()
