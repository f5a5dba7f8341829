"""Scan/export operators — the reference's `scan` subcommand.

Reference semantics (scan/scan.go:22-65): paginated ascending key-order scan
of ``[start, end)``, each pair rendered ``key:HEX, value:HEX, cnt:N`` with a
running counter, buffered to a sorted text file.

Spark mapping (SURVEY.md §2.1 S4, §2.5 O1, §2.4 A5): filter → global sort →
hex projection → global running counter → file sink.  Pagination (10240-pair
pages, resume at lastKey+0x00) is subsumed by Spark's iterator execution; the
range predicate pushes into the parquet scan.

The running counter is the one operator where a naive Spark translation
(``row_number`` over an unpartitioned window) collapses to a single
partition.  ``with_global_index`` implements the scalable form: range
partition → per-partition local row_number → broadcast per-partition offsets
— two passes, no single-partition stage, correct dense global numbering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from tikv_data_compare_spark.model import Keyed


def range_scan(keyed: Keyed, start=None, end=None, sort: bool = True) -> DataFrame:
    """Rows of ``keyed`` with first-key in ``[start, end)``, ascending key order.

    The filter compiles to a parquet PushedFilters range (the Spark analogue
    of shipping the range inside the Scan RPC, scan/scan.go:45)."""
    df = keyed.in_range(start, end).df
    return df.orderBy(*keyed.keys) if sort else df


def with_global_index(
    df: DataFrame,
    order_cols: list[str],
    name: str = "cnt",
    start: int = 1,
    boundaries: list[tuple] | None = None,
) -> DataFrame:
    """Dense global 1-based index in ``order_cols`` order, scalably.

    Plan shape: assign each row a *data-derived* range-bucket id (binary
    search over sampled boundary literals), local row_number per bucket,
    then add each bucket's cumulative offset (a tiny broadcast join —
    #buckets rows).  No global single-partition window; survives 100×
    scale-up where ``Window.orderBy`` without partitioning would not.

    The bucket id MUST be a pure function of the row, never
    ``spark_partition_id`` over ``repartitionByRange``: range partitioning
    samples its boundaries per-execution, so the offsets branch and the
    ranks branch can see *different* partitionings unless the exchange
    happens to be reused — observed as a corrupted counter on a 15k-row
    table.  Boundary sampling here runs once, driver-side, and both
    branches share the literal expression, so they agree by construction.

    Pass ``boundaries`` (an ascending list of key tuples, e.g. derived from
    parquet footer min/max stats or a previous run) to skip boundary
    sampling entirely — plan construction then runs ZERO Spark jobs and the
    index costs one scan of the input.  Without it, the key projection is
    cached around the count+sample pass, so the upstream lineage is
    computed once, not once per boundary job.  Boundaries only steer bucket
    SIZES — any ascending subset of the key domain yields a correct index.
    """
    n = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    bucket = _range_bucket_expr(df, order_cols, n, boundaries)
    w = Window.partitionBy("_bid").orderBy(*[F.col(c) for c in order_cols])
    local = df.withColumn("_bid", bucket).withColumn("_rn", F.row_number().over(w))
    # offsets: #buckets rows — the single-partition window is on tiny data
    # (bounded_global_window: constant partition key, no WindowExec WARN)
    from tikv_data_compare_spark.functions.winutil import bounded_global_window

    woff = bounded_global_window("_bid", "_bid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        local.groupBy("_bid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn("_off", F.coalesce(F.sum("_cnt").over(woff), F.lit(0)))
        .select("_bid", "_off")
    )
    return (
        local.join(F.broadcast(offsets), "_bid")
        .withColumn(name, F.col("_rn") + F.col("_off") + F.lit(start - 1))
        .drop("_bid", "_rn", "_off")
    )


def _range_bucket_expr(df: DataFrame, order_cols: list[str], n: int, boundaries=None):
    """Monotone bucket id from ``order_cols``: sampled (or caller-supplied)
    boundaries → literal comparison chain.  Bucket i holds rows < boundary
    i; ids increase with key order, so cumulative bucket counts give global
    offsets.

    Without ``boundaries``: one cached scan of the key projection feeding a
    count + a sampled collect of ~64·n key tuples.  Boundaries are
    deduplicated so duplicate-heavy keys just yield fewer, larger buckets
    (still correct).
    """
    if boundaries is not None and len(boundaries) == 0:
        # exactly what parquet_key_boundaries returns when footer stats are
        # absent — fall through to the sampling path instead of silently
        # collapsing the index to one bucket
        boundaries = None
    if boundaries is not None:
        bounds = [tuple(b) if not isinstance(b, tuple) else b for b in boundaries]
        if any(bounds[i] >= bounds[i + 1] for i in range(len(bounds) - 1)):
            raise ValueError("boundaries must be strictly ascending key tuples")
    else:
        # cache the key projection so the (possibly expensive, uncached)
        # upstream plan is computed once for both boundary jobs, instead of
        # once per job — at 100 TB that was two extra full scans per export
        keys = df.select(*order_cols).persist()
        try:
            total = keys.count()
            target = 64 * n
            if total <= 1 or n <= 1:
                return F.lit(0)
            frac = min(1.0, target / total)
            sampled = sorted(tuple(r) for r in keys.sample(fraction=frac, seed=42).collect())
        finally:
            keys.unpersist()
        if not sampled:
            return F.lit(0)
        step = max(1, len(sampled) // n)
        bounds = []
        for i in range(step, len(sampled), step):
            if not bounds or sampled[i] > bounds[-1]:
                bounds.append(sampled[i])

    dts = {f.name: f.dataType for f in df.schema.fields}

    def tuple_lit(t):
        lits = [F.lit(v).cast(dts[c]) for v, c in zip(t, order_cols)]
        return lits[0] if len(order_cols) == 1 else F.struct(*lits)

    probe = F.col(order_cols[0]) if len(order_cols) == 1 else F.struct(
        *[F.col(c) for c in order_cols]
    )
    expr = F.lit(len(bounds))  # >= last boundary → final bucket
    for i in range(len(bounds) - 1, -1, -1):
        expr = F.when(probe < tuple_lit(bounds[i]), F.lit(i)).otherwise(expr)
    return expr


def parquet_key_boundaries(path: str, col: str, max_boundaries: int = 256) -> list[tuple]:
    """Ascending bucket boundaries for :func:`with_global_index` derived
    from parquet ROW-GROUP FOOTER STATS — no Spark job, no data read: each
    row group's min/max for ``col`` comes from the file metadata, so the
    boundary pre-pass (count + sample) disappears entirely and the export
    runs exactly one scan of the input.

    Boundaries are row-group maxima (deduplicated, sorted, thinned to
    ``max_boundaries``); any ascending subset of the key domain is correct
    for bucketing (bucket sizes just follow the row-group layout).  Returns
    ``[]`` when stats are absent — callers fall back to sampling."""
    import glob as _glob
    import os

    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, "*.parquet"))) or sorted(
            f for f in _glob.glob(os.path.join(path, "*")) if os.path.isfile(f)
        )
    else:
        files = [path]
    return _boundaries_from_files(files, col, max_boundaries)


def _boundaries_from_files(files: list[str], col: str, max_boundaries: int = 256) -> list[tuple]:
    import pyarrow.parquet as pq

    maxima = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        if col not in idx:
            raise ValueError(f"column {col!r} not in parquet schema of {f}")
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(idx[col]).statistics
            if stats is None or not stats.has_min_max:
                return []
            maxima.append(stats.max)
    bounds = sorted(set(maxima))
    if len(bounds) > 1:
        bounds = bounds[:-1]  # the global max bounds nothing to its right
    if len(bounds) > max_boundaries:
        step = len(bounds) / max_boundaries
        bounds = [bounds[int(i * step)] for i in range(max_boundaries)]
    return [(b,) for b in bounds]


def auto_boundaries(df: DataFrame, key_cols: list[str]) -> list[tuple] | None:
    """Footer-stat boundaries discovered from the DataFrame's OWN source
    files (``df.inputFiles()`` — metadata only, no job), so parquet-backed
    exports get the zero-pre-pass index path without the caller threading a
    path through.  Returns ``None`` (→ sampling fallback) for multi-column
    keys, non-parquet sources, or stats-less files."""
    if len(key_cols) != 1:
        return None
    try:
        files = list(df.inputFiles())
    except Exception:  # noqa: BLE001 — non-file-backed plans (rdd, in-memory)
        return None
    if not files or not all(f.endswith(".parquet") for f in files):
        return None
    paths = [f[len("file:") :] if f.startswith("file:") else f for f in files]
    try:
        bounds = _boundaries_from_files(paths, key_cols[0])
    except Exception:  # noqa: BLE001 — remote filesystems, schema drift
        return None
    return bounds or None


def export_hex(
    keyed: Keyed,
    start=None,
    end=None,
    path: str | None = None,
    boundaries: list[tuple] | None = None,
) -> DataFrame:
    """Sorted hex dump with running counter — the reference's scan output line
    ``key:<HEX>, value:<HEX>, cnt:<n>`` (scan/scan.go:52), as a DataFrame
    ``[key_hex, value_hex, cnt]``.

    Binary columns render as uppercase hex directly; typed columns render as
    uppercase hex of their canonical '|'-joined string (same convention both
    in Spark and the DuckDB oracle).  When ``path`` is given, also writes the
    formatted text lines (ordered) there.

    When ``boundaries`` is not supplied and the input is parquet-backed with
    a single-column key, counter boundaries come from the parquet footer
    stats automatically (:func:`auto_boundaries`) — the export then runs
    exactly ONE scan of the input, with the count+sample pre-pass reserved
    for sources without usable stats.
    """
    df = keyed.in_range(start, end).df
    if boundaries is None:
        boundaries = auto_boundaries(df, list(keyed.keys))

    def hex_of(cols: tuple[str, ...]) -> F.Column:
        from tikv_data_compare_spark.functions import sqlgen

        types = {fld.name: fld.dataType.typeName() for fld in df.schema.fields}
        if len(cols) == 1 and types[cols[0]] == "binary":
            return F.upper(F.hex(F.col(cols[0])))
        tags = sqlgen.tags_from_spark_schema(df)
        canon = sqlgen.row_canon([(c, tags[c]) for c in cols], sqlgen.SPARK)
        # hex of a string hexes its UTF-8 bytes in both Spark and DuckDB;
        # canonical rendering (not raw casts) keeps it engine-stable
        return F.upper(F.hex(F.expr(canon)))

    hexed = df.select(
        *[F.col(c) for c in keyed.keys],
        hex_of(keyed.keys).alias("key_hex"),
        hex_of(keyed.values).alias("value_hex"),
    )
    numbered = with_global_index(
        hexed, list(keyed.keys), "cnt", boundaries=boundaries
    ).select("key_hex", "value_hex", "cnt")
    if path:
        # global sort only on the file-writing path (ordered part files);
        # the returned DataFrame skips that exchange — callers needing order
        # sort on cnt themselves
        lines = numbered.orderBy("cnt").select(
            F.format_string("key:%s, value:%s, cnt:%d.", "key_hex", "value_hex", "cnt").alias("value")
        )
        lines.write.mode("overwrite").text(path)
        # metadata sidecar: the source-level API-version handshake
        # (reference utils/utils.go:13-26) rides with the dump
        from tikv_data_compare_spark.sources.meta import write_dump_meta

        write_dump_meta(path)
    return numbered
