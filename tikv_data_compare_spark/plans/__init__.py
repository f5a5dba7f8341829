"""Plan inspection helpers: assert the physical plans we designed for.

Used by tests (and available to users) to verify the scale-critical plan
properties: filters pushed to the scan, broadcast where intended, partial
aggregation present, no cartesian products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (modes: simple/extended/formatted/cost)."""
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    em = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return qe.explainString(em)


def has_pushed_filter(df: DataFrame, fragment: str = "") -> bool:
    """True if the parquet scan carries PushedFilters (optionally matching
    ``fragment``)."""
    s = plan_string(df)
    for line in s.splitlines():
        if "PushedFilters" in line and "[]" not in line.split("PushedFilters", 1)[1][:4]:
            if not fragment or fragment in line:
                return True
    return False


def has_partial_aggregation(df: DataFrame) -> bool:
    """True if the plan contains the partial→final HashAggregate pair (the
    reference's region-merge for free, SURVEY.md §2.4 A4)."""
    s = plan_string(df)
    return s.count("HashAggregate") >= 2 or "partial_" in s


def has_cartesian(df: DataFrame) -> bool:
    s = plan_string(df)
    return "CartesianProduct" in s


def join_strategies(df: DataFrame) -> set[str]:
    s = plan_string(df)
    found = set()
    for name in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        if name in s:
            found.add(name)
    return found
