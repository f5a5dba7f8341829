"""Window helpers.

``bounded_global_window`` marks the repo's *intentionally* single-partition
windows — prefix sums, totals, and ranks over frames already reduced to a
bounded row count (#range-buckets, top_n keys, k winners).  A bare
``Window.orderBy(...)`` / ``Window.partitionBy()`` is correct there but
fires WindowExec's "No Partition Defined" WARN on every execution, which
buries the one case that warning exists to catch: a REAL unpartitioned
window over data-sized input (VERDICT r12 task 4).  Partitioning by
``pmod(<numeric col>, 1)`` — a constant 0 that Catalyst does NOT
constant-fold away (literal and ``key * 0`` partition keys are folded and
the warning returns) — keeps the identical single-partition execution
while making the boundedness explicit, so any remaining WindowExec WARN
in a bench tail is a finding, not noise.
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec, functions as F


def bounded_global_window(
    const_key_col: str, *order_cols: str | Column
) -> WindowSpec:
    """A single-partition WindowSpec for a BOUNDED frame (callers hold the
    ≤-bounded-rows invariant; this helper only encodes it).

    ``const_key_col``: any NUMERIC, NON-NULL column of the frame —
    ``pmod(col, 1)`` is the constant-0 partition key that routes every row
    to one partition exactly like an empty partition spec, minus the WARN.
    Omit ``order_cols`` for unordered full-frame specs (callers add
    ``rowsBetween``)."""
    spec = Window.partitionBy(F.expr(f"pmod({const_key_col}, 1)"))
    return spec.orderBy(*order_cols) if order_cols else spec
