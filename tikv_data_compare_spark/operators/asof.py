"""As-of and range joins — operators Spark lacks natively.

- ``asof_join``: for each left row, the latest right row with
  ``right_ts <= left_ts`` per key.  Implemented as the union-window trick:
  tag both sides, union, sort within key by (ts, side), propagate the last
  seen right payload with ``last_value(ignoreNulls)``, keep left rows.
  One shuffle on the key, no per-group Python — scales like any window.
  (The applyInPandas + merge_asof alternative ships every group through
  Python; this stays JVM-side.)

- ``range_join``: equi-join a point column against arbitrary [lo, hi)
  intervals by bucketizing: intervals explode to the fixed-width buckets
  they overlap, points compute their bucket, equi-join on bucket, exact
  filter.  Turns a theta-join (cartesian in Spark) into a shuffle join;
  bucket width trades replication factor against bucket selectivity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F, types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    how: str = "left",
) -> DataFrame:
    """Latest-right-at-or-before join.

    Right side should be unique per (on, right_ts) — pre-aggregate if not,
    or the match among ties is unspecified.  Returns all left columns plus
    ``payload_cols`` from the matched right row (null when none precedes and
    ``how='left'``; matched-only when ``how='inner'``).
    """
    lcols = left.columns
    if "_matched" in payload_cols:
        raise ValueError(
            "payload column name '_matched' is reserved for the as-of match marker"
        )
    clash = [c for c in payload_cols if c in lcols]
    if clash:
        raise ValueError(
            f"payload columns {clash} collide with left columns; alias them on the "
            "right side before joining (output keeps all left columns + payloads)"
        )
    # Payloads travel as ONE struct (match marker + all payload columns) so a
    # single last(ignorenulls) propagates them atomically: a matched right row
    # with NULLs in some payload columns still contributes exactly its own
    # values, never a stitch of older rows — and an all-NULL-payload match is
    # still a match (the marker is non-null for every right row).
    p_struct = T.StructType(
        [T.StructField("_matched", T.BooleanType(), False)]
        + [T.StructField(c, right.schema[c].dataType, True) for c in payload_cols]
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(p_struct).alias("_p"),
    )
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(
            F.lit(True).alias("_matched"),
            *[F.col(c).alias(c) for c in payload_cols],
        ).alias("_p"),
    )
    u = l.unionByName(r)
    # right rows sort before left rows at equal _t, so "at-or-before" matches
    w = (
        Window.partitionBy("_k")
        .orderBy(F.asc("_t"), F.asc("_is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select("*", F.last("_p", ignorenulls=True).over(w).alias("_f"))
    out = filled.filter(F.col("_is_left") == 1)
    if how == "inner":
        out = out.filter(F.col("_f").getField("_matched").isNotNull())
    return out.select(
        *lcols, *[F.col("_f").getField(c).alias(c) for c in payload_cols]
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join points to the intervals containing them ([lo, hi)), via
    fixed-width bucketization (see module docstring)."""
    b = F.lit(bucket_width)
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / b).cast("long"),
                F.floor((F.col(hi_col) - F.lit(1e-9)) / b).cast("long"),
            )
        ),
    )
    pt = points.withColumn("_bucket", F.floor(F.col(point_col) / b).cast("long"))
    joined = pt.join(iv, on="_bucket", how="inner").filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    )
    return joined.drop("_bucket")
