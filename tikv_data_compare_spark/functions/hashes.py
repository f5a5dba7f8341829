"""Hash functions: CRC64 (TiKV-compatible) and helpers.

The reference's checksum delegates per-pair hashing to TiKV's coprocessor,
whose algorithm is CRC-64/XZ ("ECMA" polynomial, reflected, init/xorout
~0) over ``key ++ value``, XOR-combined across pairs (SURVEY.md §1.4; public
TiKV semantics — the client merge is reference checksum/checksum.go:25-29).

``crc64_xz`` is a pure-Python table-driven implementation (byte-compat mode,
for interop with real TiKV checksums); the engine's default fast path uses
Spark's built-in ``xxhash64`` and the oracle path uses the cross-engine
``md5_i64`` (functions/sqlgen.py) — same commutative-monoid structure, no
Python in the hot loop.
"""

import functools

_POLY_REFLECTED = 0xC96C5795D7870F42  # bit-reversed ECMA-182 polynomial
_MASK = (1 << 64) - 1


@functools.lru_cache(maxsize=1)
def _crc64_table() -> list[int]:
    table = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ _POLY_REFLECTED if c & 1 else c >> 1
        table.append(c)
    return table


def crc64_xz(data: bytes) -> int:
    """CRC-64/XZ of ``data`` (check value: crc64_xz(b'123456789') == 0x995DC9BBDF1939FA)."""
    table = _crc64_table()
    crc = _MASK
    for byte in data:
        crc = table[(crc ^ byte) & 0xFF] ^ (crc >> 8)
    return crc ^ _MASK


def _crc64_signed(data: bytes) -> int:
    """crc64 as a signed 64-bit value (Spark LongType is signed)."""
    v = crc64_xz(data)
    return v - (1 << 64) if v >= (1 << 63) else v


def crc64_pandas_udf():
    """Vectorized (Arrow-batched) crc64 over a binary column → LongType.

    Per-row Python byte loop inside an Arrow batch — acceptable for the
    byte-compat mode only; the default checksum algos stay JVM-side.

    Self-contained closure: the table is built inside the UDF so executors
    need no import of this package (works under spark-submit without
    --py-files as well as in local mode).
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    poly = _POLY_REFLECTED

    @F.pandas_udf(T.LongType())
    def crc64(s: pd.Series) -> pd.Series:
        table = []
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            table.append(c)
        mask = (1 << 64) - 1

        def one(b):
            if b is None:
                return None
            crc = mask
            for byte in bytes(b):
                crc = table[(crc ^ byte) & 0xFF] ^ (crc >> 8)
            crc ^= mask
            return crc - (1 << 64) if crc >= (1 << 63) else crc

        return s.map(one)

    return crc64


def register_hash_udfs(spark) -> None:
    spark.udf.register("crc64", crc64_pandas_udf())
