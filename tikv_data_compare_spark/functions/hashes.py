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

    Vectorized ACROSS ROWS with numpy: CRC is inherently sequential over the
    bytes of one value, but each byte step can be applied to the whole batch
    at once (pad to the batch max length, mask out finished rows).  ~100×
    faster than a per-row Python loop, which matters because this is the
    byte-compat mode for real TiKV checksum interop.

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
        import numpy as np

        table_list = []
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            table_list.append(c)
        table = np.array(table_list, dtype=np.uint64)

        vals = [b"" if b is None else bytes(b) for b in s]
        nulls = np.array([b is None for b in s])
        n = len(vals)
        if n == 0:
            return pd.Series([], dtype="object")
        lens = np.array([len(v) for v in vals], dtype=np.int64)
        maxlen = int(lens.max()) if n else 0
        # (rows, maxlen) zero-padded byte matrix
        mat = np.zeros((n, maxlen), dtype=np.uint8)
        for i, v in enumerate(vals):
            if v:
                mat[i, : len(v)] = np.frombuffer(v, dtype=np.uint8)
        crc = np.full(n, 0xFFFFFFFFFFFFFFFF, dtype=np.uint64)
        for j in range(maxlen):
            active = lens > j
            if not active.any():
                break
            cj = crc[active]
            idx = (cj ^ mat[active, j].astype(np.uint64)) & np.uint64(0xFF)
            crc[active] = table[idx.astype(np.intp)] ^ (cj >> np.uint64(8))
        crc ^= np.uint64(0xFFFFFFFFFFFFFFFF)
        signed = crc.astype(np.int64)
        out = pd.Series(signed, dtype="object")
        out[nulls] = None
        return out

    return crc64


def register_hash_udfs(spark) -> None:
    spark.udf.register("crc64", crc64_pandas_udf())
