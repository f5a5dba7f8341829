"""Skew-mitigation utilities: salting for hot keys.

AQE's skew-join handles most cases (`spark.sql.adaptive.skewJoin.enabled`,
on in session defaults); these helpers cover the two places AQE can't:
aggregation skew (one giant group) and deliberate pre-salting when the hot
keys are known.

Pattern (SURVEY.md 'Optimize for scale'): split a hot key into ``n_salts``
sub-keys, aggregate partially per sub-key, then merge — the same
commutative-monoid trick the checksum uses (checksum/checksum.go:25-29
merges region partials), applied to any decomposable aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def with_salt(df: DataFrame, n_salts: int = 16, col_name: str = "_salt") -> DataFrame:
    """Deterministic row salt in [0, n_salts): hash-based, no RNG state, so
    retried tasks produce identical salts (rand() would not be replay-safe)."""
    h = F.xxhash64(*[F.col(c) for c in df.columns])
    return df.withColumn(col_name, F.pmod(h, F.lit(n_salts)).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys.

    ``aggs`` maps output name → (partial_agg_expr, merge_agg_expr over the
    partial column).  Stage 1 groups by (keys + salt) — the hot group splits
    across n_salts reducers; stage 2 merges the ≤n_salts partials per key.

    Example::

        salted_agg(df, ["k"], {
            "n":   (F.count(F.lit(1)),   F.sum("n")),
            "xor": (F.bit_xor("h"),      F.bit_xor("xor")),
        })
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    merged = partial.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_, merge) in aggs.items()]
    )
    return merged


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side
    n_salts× — the hot key's rows spread over n_salts partitions instead of
    one.  Use when one side is small-ish but above the broadcast threshold
    and the big side has hot keys; plain broadcast is better when it fits.
    """
    big_s = with_salt(big, n_salts)
    salts = big.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
    small_r = small.crossJoin(F.broadcast(salts))
    out = big_s.join(small_r, on=[*on, "_salt"], how=how)
    return out.drop("_salt")


def hot_keys(
    df: DataFrame,
    key_cols: list[str],
    top_n: int = 100,
) -> DataFrame:
    """Exact heavy-hitter profile: the top-``top_n`` hottest keys with their
    row counts and corpus share — the pre-flight check before a 100 TB join
    or aggregation on ``key_cols`` (its output is how you SIZE ``with_salt``:
    a key holding share_bp/10000 of the table needs ~share·cluster_cores
    salts to spread across tasks).

    Returns ``(rank, <key_cols...>, n, share_bp)``: rank by count desc with
    key-ascending tie-break; ``share_bp`` = n·10000 / total rows (integer
    floor division — exact in any engine).

    Scale shape: ONE partial-aggregated groupBy over the keys, then a
    distributed TakeOrdered (``orderBy().limit(top_n)`` — per-partition
    top-N merge, NOT a global sort) plus a 1-row total broadcast; the final
    rank window runs over ≤ top_n rows.  Exact, unlike a Misra-Gries /
    count-min sketch — at the profile stage you want the true counts, and
    one groupBy over the key column is a scan-shaped pass.
    """
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    grouped = df.groupBy(*key_cols).agg(F.count(F.lit(1)).cast("long").alias("n"))
    total = grouped.agg(F.sum("n").cast("long").alias("_total"))
    top = grouped.orderBy(
        F.desc("n"), *[F.asc(k) for k in key_cols]
    ).limit(top_n)
    # final rank over ≤ top_n rows (bounded_global_window: constant
    # partition key, no WindowExec WARN)
    from tikv_data_compare_spark.functions.winutil import bounded_global_window

    w = bounded_global_window("n", F.desc("n"), *[F.asc(k) for k in key_cols])
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("share_bp", F.expr("CAST(n * 10000 DIV _total AS BIGINT)"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", *key_cols, "n", "share_bp")
    )
