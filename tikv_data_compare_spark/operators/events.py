"""Event-sequence analytics: ordered conversion funnels and inter-event gap
profiles.

Both operators are single-shuffle designs: every window and the follow-up
groupBy share ONE user-partitioning, so at 100 TB the cost is one exchange of
(user, type, ts) triples — no self-joins, no per-user collect.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def funnel_times(
    df: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ms",
) -> DataFrame:
    """Per-user first-touch cascade reach times.

    ``t1`` = min ts of a stage-1 event; ``t_k`` = min ts of a stage-k event
    at-or-after ``t_{k-1}`` — NULL from the first unreached stage onward (a
    NULL ``t_{k-1}`` nulls the comparison, so later stages can't match).

    Shape: len(stages) chained window-mins over the SAME user partitioning
    (one exchange, one sort, Window operators back-to-back), then a groupBy
    on the already-partitioned key (no second exchange) collapsing the
    partition-constant columns.
    """
    if len(stages) < 1:
        raise ValueError("funnel needs at least one stage")
    w = Window.partitionBy(user_col)
    cur = df.withColumn(
        "t1", F.min(F.when(F.col(type_col) == stages[0], F.col(ts_col))).over(w)
    )
    for i, stage in enumerate(stages[1:], start=2):
        cur = cur.withColumn(
            f"t{i}",
            F.min(
                F.when(
                    (F.col(type_col) == stage) & (F.col(ts_col) >= F.col(f"t{i-1}")),
                    F.col(ts_col),
                )
            ).over(w),
        )
    return cur.groupBy(user_col).agg(
        *[F.min(f"t{i}").alias(f"t{i}") for i in range(1, len(stages) + 1)]
    )


def funnel_counts(
    df: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ms",
) -> DataFrame:
    """Scalar funnel rollup: total users plus, per stage, how many users
    reached it (non-null cascade time) — columns ``n_users, n_<stage>...``."""
    per_user = funnel_times(df, stages, user_col, type_col, ts_col)
    return per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        *[
            F.count(f"t{i}").cast("long").alias(f"n_{stage}")
            for i, stage in enumerate(stages, start=1)
        ],
    )


def gap_profile(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ms",
    tiebreak_col: str = "event_id",
    long_gap_ms: int = 1_800_000,
) -> DataFrame:
    """Per-user inter-event gap profile: event/gap counts, max/sum gap, and
    the number of gaps above ``long_gap_ms`` (the sessionize threshold).
    One lag window + one groupBy over the same user partitioning; exact
    integer arithmetic throughout."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    gapped = df.withColumn("gap", F.col(ts_col) - F.lag(ts_col).over(w))
    return gapped.groupBy(user_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count("gap").cast("long").alias("n_gaps"),
        F.max("gap").alias("max_gap_ms"),
        F.sum("gap").alias("sum_gap_ms"),
        F.count(F.when(F.col("gap") > long_gap_ms, 1)).cast("long").alias("n_long_gaps"),
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ms",
    tiebreak_col: str = "event_id",
    gap_ms: int = 1_800_000,
) -> DataFrame:
    """Per-user sessions split on ``> gap_ms`` silences — the batch form of
    the streaming session window.

    Plan shape: ONE hash-partition shuffle on ``user_col`` shared by the
    lag window, the running-sum window, and the final groupBy (the
    partitioning is reused, plan-asserted in tests/test_plans.py via the
    driver row).  A hot user inflates a single partition — moderate skew is
    AQE's job; extreme skew has operators/skew.py.  Stress behavior under a
    20%-of-all-events user is pinned by tests/test_skew.py."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    gapped = df.withColumn(
        "new_s",
        F.when(
            F.lag(ts_col).over(w).isNull()
            | ((F.col(ts_col) - F.lag(ts_col).over(w)) > gap_ms),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = gapped.withColumn(
        "session_idx", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy(user_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(ts_col) - F.min(ts_col)).alias("duration_ms"),
        F.min(tiebreak_col).alias("first_event"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Day-cohort retention matrix: users are assigned to the cohort of
    their FIRST active day; each later active day counts them once in
    ``(cohort_day, period)`` where period = days since the cohort day.
    Returns ``(cohort_day_ms, period_days, n_users)`` — the standard
    product-analytics retention triangle.

    Scale shape: one groupBy(user) for the first-day frame (partial agg,
    ids only), one keyed equi-join back on the user id, one distinct-count
    agg on (cohort, period) — nothing wider than (user, day) ever
    shuffles, so at 100 TB the cost is two keyed shuffles of id pairs.
    Day arithmetic is integer (days since epoch ×86400000), so the output
    is engine-exact for the DuckDB oracle.
    """
    # TIMESTAMP(NANOS) parquet reads as a nanosecond LONG under
    # legacy.parquet.nanosAsLong (the seam _events_ms defends; to_date on
    # that long would null out under non-ANSI — r8 review): derive the day
    # with integer DIV (a double division would lose precision at ~1e18 ns).
    # unix_date returns INT: cast to long BEFORE the ×86_400_000, which
    # overflows 32 bits for any date past ~1970-01-25.
    ts_type = {f.name: f.dataType.typeName() for f in events.schema.fields}[ts_col]
    if ts_type in ("long", "bigint"):
        day = F.expr(f"CAST({ts_col} DIV 86400000000000 AS BIGINT)")
    else:
        day = F.unix_date(F.to_date(F.col(ts_col))).cast("long")
    ed = events.select(F.col(user_col).alias("_u"), day.alias("_day"))
    first = ed.groupBy("_u").agg(F.min("_day").alias("_cohort"))
    return (
        ed.join(first, "_u")
        .groupBy(
            (F.col("_cohort") * 86_400_000).alias("cohort_day_ms"),
            (F.col("_day") - F.col("_cohort")).alias("period_days"),
        )
        .agg(F.count_distinct("_u").cast("long").alias("n_users"))
        .select(
            F.col("cohort_day_ms").cast("long"),
            F.col("period_days").cast("long"),
            "n_users",
        )
    )
