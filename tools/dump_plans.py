#!/usr/bin/env python
"""Dump .explain("formatted") plans for bench entries / registry rows.

Usage:
  python tools/dump_plans.py <suffix> [bench:NAME|query:NAME ...]

Writes plans/r18/<NAME>_<suffix>.txt for each requested plan — the
optimization-round deliverable (the judge checks plan claims against these
files).  ``bench:`` names resolve through bench.build_benches (the exact
frames the bench forces); ``query:`` names through the declared registry.
Building a frame may run the operator's eager driver-side jobs (collects,
curate()'s funnel materialization) — that is the real plan the entry times.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLAN_DIR", "r19"),
    )
    os.makedirs(out_dir, exist_ok=True)

    from tikv_data_compare_spark.session import get_spark

    spark = get_spark("dump-plans")

    import bench as bench_mod
    from tikv_data_compare_spark import queries as q

    benches = None
    for spec in names:
        kind, _, name = spec.partition(":")
        try:
            if kind == "bench":
                if benches is None:
                    benches = bench_mod.build_benches(spark, sf_dir)
                df = benches[name]()
            else:
                df = q.queries()[name](spark, sf_dir)
            buf = io.StringIO()
            stdout, sys.stdout = sys.stdout, buf
            try:
                df.explain("formatted")
            finally:
                sys.stdout = stdout
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"[plans] wrote {path}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — report and continue with the rest
            print(f"[plans] FAILED {spec}: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
