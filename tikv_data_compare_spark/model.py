"""Data model: the *keyed DataFrame* abstraction.

The reference's only data abstraction is an ordered ``key: binary -> value:
binary`` map (reference scan/scan.go:45, diff/diff.go:49; ordering is unsigned
bytewise — the ``lastKey+0x00`` resume at scan/scan.go:59 proves it).  Spark's
``BinaryType`` comparison is also unsigned lexicographic, so a two-column
binary DataFrame models a RawKV cluster exactly.

Every operator in this engine is written against :class:`Keyed` — one or more
key columns plus one or more value columns — with the two-column KV schema as
the canonical narrow case.  That keeps the reference semantics exact while
letting the same operators run on the typed parquet fixtures for the DuckDB
oracle gate (SURVEY.md §1.5).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F, types as T

KV_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), False),
        T.StructField("value", T.BinaryType(), False),
    ]
)


@dataclass(frozen=True)
class Keyed:
    """A DataFrame with declared key and value columns.

    ``keys`` must uniquely identify a row for keyed diff semantics (the
    reference guarantees this trivially — TiKV keys are unique).
    """

    df: DataFrame
    keys: tuple[str, ...] = ("key",)
    values: tuple[str, ...] = ("value",)

    def __post_init__(self):
        cols = set(self.df.columns)
        missing = [c for c in (*self.keys, *self.values) if c not in cols]
        if missing:
            raise ValueError(f"columns {missing} not in DataFrame {self.df.columns}")

    @staticmethod
    def of(df: DataFrame, keys=("key",), values=None) -> "Keyed":
        keys = tuple(keys)
        if values is None:
            values = tuple(c for c in df.columns if c not in keys)
        return Keyed(df.select(*keys, *values), keys, tuple(values))

    @property
    def columns(self) -> tuple[str, ...]:
        return (*self.keys, *self.values)

    def key_cols(self) -> list[Column]:
        return [F.col(c) for c in self.keys]

    def in_range(self, start=None, end=None) -> "Keyed":
        """Half-open key-range restriction ``[start, end)`` on the first key
        column; ``None`` bound = unbounded (reference config/config.go:32-33).

        The predicate is a plain comparison on the leading key column, so
        Catalyst pushes it into the parquet scan (row-group min/max pruning) —
        the Spark equivalent of the reference shipping the range inside every
        Scan/Checksum RPC (scan/scan.go:45, checksum/checksum.go:83).
        """
        df = self.df
        k = F.col(self.keys[0])
        if start is not None:
            df = df.filter(k >= F.lit(start))
        if end is not None:
            df = df.filter(k < F.lit(end))
        return Keyed(df, self.keys, self.values)


def check_comparable(src: Keyed, dst: Keyed) -> None:
    """Schema-equality gate before any comparison.

    The Spark analogue of the reference's API-version precondition: src and
    dst cluster versions must match before checksum/scan/diff run
    (reference checksum/checksum.go:134-137, scan/scan.go:83-86,
    diff/diff.go:81-84, utils/utils.go:13-26).
    """
    if src.keys != dst.keys or src.values != dst.values:
        raise ValueError(
            f"src/dst column roles differ: {src.keys}/{src.values} vs {dst.keys}/{dst.values}"
        )
    s = [(f.name, f.dataType) for f in src.df.schema.fields if f.name in src.columns]
    d = [(f.name, f.dataType) for f in dst.df.schema.fields if f.name in dst.columns]
    if s != d:
        raise ValueError(f"schema mismatch (API-version gate): {s} vs {d}")


def schema_diff(src: DataFrame, dst: DataFrame) -> list[dict]:
    """Column-level schema drift report — what :func:`check_comparable`
    refuses to compare, itemized so an operator can act on it: one entry per
    drifted column with status ``only_src`` / ``only_dst`` /
    ``type_changed`` and the type on each side.  Empty list = comparable
    schemas.  Driver-side metadata only (no Spark job); the typed analogue
    of diffing two clusters' API versions before touching data."""
    s = {f.name: f.dataType.simpleString() for f in src.schema.fields}
    d = {f.name: f.dataType.simpleString() for f in dst.schema.fields}
    out = []
    for name in sorted(s.keys() | d.keys()):
        st, dt = s.get(name), d.get(name)
        if st == dt:
            continue
        status = "only_src" if dt is None else "only_dst" if st is None else "type_changed"
        out.append({"column": name, "status": status, "src_type": st, "dst_type": dt})
    return out


def unique_by_key(df: DataFrame, keys: list[str], order_cols: list[str] | None = None) -> DataFrame:
    """Canonicalize to one row per key (deterministically).

    The reference's data model guarantees unique keys (TiKV keys are unique);
    typed tables may not (the fixture ``lineitem`` has duplicate
    ``(l_orderkey, l_linenumber)`` pairs).  Keeps the first row per key in
    ``order_cols`` order (default: all non-key columns — a total order when
    full rows are distinct).  One shuffle on the key — same cost class as the
    keyed join that usually follows, and AQE coalesces the two.
    """
    from pyspark.sql import Window

    if order_cols is None:
        order_cols = [c for c in df.columns if c not in keys]
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


def to_kv(df: DataFrame, keys: list[str], values: list[str] | None = None) -> DataFrame:
    """Render a typed table as the canonical binary KV pair schema.

    Key = concatenation of fixed-width big-endian encodings of the key columns
    (so bytewise order equals tuple order — the memcomparable property);
    value = canonical '|'-joined string bytes of the value columns.  This is
    how FIXTURES.md §1 constructs reference-faithful KV fixtures from
    ``lineitem``.
    """
    if values is None:
        values = [c for c in df.columns if c not in keys]

    def be_bytes(c: str, dt: T.DataType) -> Column:
        col = F.col(c)
        if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType)):
            # two's-complement → order-preserving unsigned: flip the sign bit,
            # then render as 16-char hex (big-endian) and unhex to 8 bytes.
            flipped = col.cast("long").bitwiseXOR(F.lit(-(1 << 63)).cast("long"))
            return F.unhex(F.lpad(F.hex(flipped), 16, "0"))
        if isinstance(dt, T.StringType):
            return col.cast("binary")
        if isinstance(dt, T.BinaryType):
            return col
        return col.cast("string").cast("binary")

    dts = dict((f.name, f.dataType) for f in df.schema.fields)
    key = F.concat(*[be_bytes(c, dts[c]) for c in keys]).alias("key")
    value = F.concat_ws("|", *[F.coalesce(F.col(c).cast("string"), F.lit("␀")) for c in values]).cast(
        "binary"
    ).alias("value")
    return df.select(key, value)
