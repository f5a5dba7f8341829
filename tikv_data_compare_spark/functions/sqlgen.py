"""Cross-engine SQL fragment generation (Spark SQL + DuckDB).

The driver's correctness gate runs each Spark query side-by-side with a DuckDB
oracle and hash-compares the result values, so every *value-producing*
expression used in an oracle-checked operator must be computable bit-for-bit
identically in both engines.  This module generates those fragments from one
source of truth, parameterized by engine, covering:

- ``canon``      — canonical string rendering per column type (doubles via
                   fixed-point scaling, timestamps via explicit format — both
                   chosen because plain double/timestamp→string formatting
                   differs between Java and DuckDB).
- ``row_canon``  — '|'-joined canonical row string (the typed-table analogue
                   of the reference's ``key ++ value`` byte string fed to
                   crc64, checksum semantics per SURVEY.md §1.4).
- ``md5_i64``    — deterministic 60-bit integer hash: first 15 hex chars of
                   md5, folded via per-char CASE arithmetic.  Pure ANSI SQL,
                   identical in both engines — the engine's oracle-checkable
                   hash primitive (xxhash64 is Spark-only, so it's kept for
                   the fast path with a rows-only check).
- small operator shims (xor / shiftright) where the engines' syntax differs.
"""

from __future__ import annotations

SPARK = "spark"
DUCK = "duck"

# column-type tags understood by canon()
INT = "int"
DOUBLE = "double"
STRING = "string"
TIMESTAMP = "timestamp"
BINARY = "binary"

NULL_SENTINEL = "␀"  # ␀ — renders nulls distinctly from empty strings

#: fixed-point scale for canonical doubles (see canon() doc)
DOUBLE_SCALE = 10_000


def cast_string(expr: str, engine: str) -> str:
    return f"CAST({expr} AS STRING)" if engine == SPARK else f"CAST({expr} AS VARCHAR)"


def canon(expr: str, tag: str, engine: str) -> str:
    """Canonical string for one column, identical across engines.

    Doubles: ``CAST(ROUND(x*10000) AS BIGINT)`` — integer formatting is
    engine-stable, unlike shortest-round-trip double formatting (Java flips to
    E-notation at 1e7; DuckDB doesn't).  Both engines round half away from
    zero; exact .5 ties after scaling are impossible for non-dyadic scaled
    values, so the engines agree.

    Timestamps: explicit millisecond format (Java pattern vs strftime).
    """
    if tag == INT:
        inner = cast_string(expr, engine)
    elif tag == DOUBLE:
        inner = cast_string(f"CAST(ROUND(({expr}) * {DOUBLE_SCALE}) AS BIGINT)", engine)
    elif tag == TIMESTAMP:
        if engine == SPARK:
            inner = f"date_format({expr}, 'yyyy-MM-dd HH:mm:ss.SSS')"
        else:
            inner = f"strftime({expr}, '%Y-%m-%d %H:%M:%S.%g')"
    elif tag == STRING:
        inner = f"({expr})"
    elif tag == BINARY:
        # uppercase hex — the reference's rendering (scan/scan.go:52)
        inner = f"upper(hex({expr}))" if engine == SPARK else f"upper(hex({expr}))"
    else:
        raise ValueError(f"unknown canon tag {tag!r}")
    return f"coalesce({inner}, '{NULL_SENTINEL}')"


def row_canon(cols: list[tuple[str, str]], engine: str) -> str:
    """'|'-joined canonical row string over (expr, tag) columns."""
    parts = ", ".join(canon(e, t, engine) for e, t in cols)
    return f"concat_ws('|', {parts})"


def hexfold_i64(expr: str) -> str:
    """Fold the first 15 hex chars of an (already computed) lowercase-hex
    string expression into a 60-bit integer.

    hexval(c) = ascii(c) - (97..102 → 87, else 48): maps '0'-'9'/'a'-'f' to
    0-15 without a 16-way CASE.  Same text runs in Spark SQL and DuckDB.

    NOTE: ``expr`` is textually repeated 30×, so pass a *column reference*
    (project the md5 into a column first) — inlining a big expression here
    blows up whole-stage codegen (observed 90s+ compile for a 1k-row agg).
    """
    terms = []
    for i in range(1, 16):
        c = f"substr({expr}, {i}, 1)"
        hexval = f"(ascii({c}) - (CASE WHEN ascii({c}) >= 97 THEN 87 ELSE 48 END))"
        shift = 16 ** (15 - i)
        # CAST keeps DuckDB from doing INT32 multiplication (overflow error)
        terms.append(f"{hexval} * CAST({shift} AS BIGINT)" if shift > 1 else hexval)
    return "(" + " + ".join(terms) + ")"


def md5_i64(expr: str, engine: str = SPARK) -> str:
    """60-bit integer from the first 15 hex chars of ``md5(expr)``.

    Only for *small* ``expr`` (a column name or short concat) — see
    :func:`hexfold_i64` for why.  In oracle SQL, prefer computing
    ``md5(...) AS _m`` in a subquery and folding ``_m``.
    """
    return hexfold_i64(f"md5({expr})")


#: det_ln tuning — 10 sqrts reduce the argument to its 1024th root, the
#: 7-term odd atanh series then converges to < 1e-20 relative for any
#: |ln(x)| <= 60 (x in [1e-26, 1e26] — every frozen-cost domain in the repo
#: is inside [1e-5, 1e19] even at 100 TB feature totals)
_DET_LN_SQRTS = 10
_DET_LN_TERMS = 7


def det_ln(x: str) -> str:
    """Deterministic natural log: same SQL text, bit-identical result in
    Spark AND DuckDB — unlike ``LN``, whose last ulp is implementation-
    defined (JVM ``Math.log`` vs libm ``log`` both promise <= 1 ulp but
    round differently), which flipped a ``ROUND-of-LN``-style frozen cost
    across hosts in round 12 (CORRECTNESS_r12 ``sampling`` red).

    Built ONLY from operations IEEE 754 requires to be correctly rounded —
    ``+ - * /``, ``sqrt`` — plus exact ``CASE``/compare, so both engines
    produce the same binary64 at every step:

        m  = sqrt^10(y),  y = x if x >= 1 else 1/x      (1024th root)
        t  = (m-1)/(m+1)
        ln(y) ~= 1024 * 2t * (1 + t^2/3 + ... + t^12/13)   [atanh series]
        ln(x) = sign * ln(y)

    Series coefficients are embedded as ``CAST('<repr>' AS DOUBLE)`` —
    string->double parsing is correctly rounded in both engines, sidestepping
    DuckDB's DECIMAL literal typing.  Accuracy ~1e-13 relative (sqrt-chain
    rounding), which is semantic-only: determinism never depends on it.

    NOTE: ``x`` is textually repeated ~55x — pass a short column reference
    (project big ratios into a column first), the :func:`hexfold_i64` rule.
    """
    y = f"(CASE WHEN ({x}) >= 1.0 THEN CAST(({x}) AS DOUBLE) ELSE 1.0 / CAST(({x}) AS DOUBLE) END)"
    m = y
    for _ in range(_DET_LN_SQRTS):
        m = f"sqrt({m})"
    t = f"(({m} - 1.0) / ({m} + 1.0))"
    t2 = f"({t} * {t})"
    h = f"CAST('{1.0 / (2 * _DET_LN_TERMS - 1)!r}' AS DOUBLE)"
    for k in range(_DET_LN_TERMS - 2, -1, -1):
        h = f"({h} * {t2} + CAST('{1.0 / (2 * k + 1)!r}' AS DOUBLE))"
    sign = f"(CASE WHEN ({x}) >= 1.0 THEN 1.0 ELSE -1.0 END)"
    scale = f"{float(2 * (1 << _DET_LN_SQRTS))!r}"
    return f"({sign} * {scale} * {t} * {h})"


def frozen_ln_c(x: str, scale: int = 1_000_000) -> str:
    """Engine-exact frozen log cost: ``round(det_ln(x) * scale)`` as BIGINT.

    The rounding is ``FLOOR(v + 0.5)`` (round-half-up toward +inf), not
    ``ROUND`` — FLOOR is exact on both engines while ROUND's tie convention
    differs (Spark HALF_UP vs DuckDB half-away) for negative values.  Since
    :func:`det_ln` is bit-deterministic, both engines floor the identical
    double and the BIGINT always agrees.
    """
    return f"CAST(FLOOR({det_ln(x)} * {float(scale)!r} + 0.5) AS BIGINT)"


def frozen_ln_c_py(x: float, scale: int = 1_000_000) -> int:
    """Python-side frozen log cost: ``floor(ln(x)·scale + 0.5)`` as int —
    the :func:`frozen_ln_c` rounding convention applied to ``math.log``.

    Used to precompute BOUNDED cost tables on the DRIVER and embed the
    same integer literals in the Spark plan AND the DuckDB oracle (the
    dsir_weights bucket-cost table, ≤ n_buckets rows, and the dsir_sample
    u-coin table, 10000 rows).  With literals on both sides, the gated
    metric contains NO cross-engine floating point at all — the r12/r13
    ``sampling`` reds both came from an engine-divergent float step
    (r12: the engine ``LN``'s last ulp; r13: Spark typing the smoothing
    quotient DECIMAL(34,12) — double-rounding — where DuckDB types it
    DOUBLE).  ``math.log`` here is the platform libm, NOT det_ln — that
    is fine and the point: the value is computed ONCE and shared, so
    cross-engine agreement is by construction, not by reproduction.
    """
    import math

    return int(math.floor(math.log(x) * scale + 0.5))


def xor(a: str, b: str, engine: str) -> str:
    """Bitwise xor of two bigints (DuckDB's ``^`` is exponentiation)."""
    return f"({a} ^ {b})" if engine == SPARK else f"xor({a}, {b})"


def shiftright(a: str, n: int, engine: str) -> str:
    return f"shiftright({a}, {n})" if engine == SPARK else f"({a} >> {n})"


def split_words(expr: str, engine: str) -> str:
    """Split on single spaces → array/list of tokens (same empties both sides)."""
    return f"split({expr}, ' ')" if engine == SPARK else f"string_split({expr}, ' ')"


def ts_ms(expr: str, engine: str) -> str:
    """Epoch milliseconds from a timestamp, identical both engines."""
    if engine == SPARK:
        return f"(unix_timestamp({expr}) * 1000 + CAST(date_format({expr}, 'SSS') AS BIGINT))"
    return f"CAST(epoch_ms({expr}) AS BIGINT)"


# canonical column tag maps for the fixture tables (FIXTURES.md §2)
TABLE_TAGS: dict[str, dict[str, str]] = {
    "lineitem": {
        "l_orderkey": INT,
        "l_partkey": INT,
        "l_suppkey": INT,
        "l_linenumber": INT,
        "l_quantity": DOUBLE,
        "l_extendedprice": DOUBLE,
        "l_discount": DOUBLE,
        "l_tax": DOUBLE,
        "l_returnflag": STRING,
        "l_linestatus": STRING,
        "l_shipdate": TIMESTAMP,
    },
    "orders": {
        "o_orderkey": INT,
        "o_custkey": INT,
        "o_orderstatus": STRING,
        "o_totalprice": DOUBLE,
        "o_orderdate": TIMESTAMP,
        "o_orderpriority": STRING,
    },
    "customer": {
        "c_custkey": INT,
        "c_name": STRING,
        "c_nationkey": INT,
        "c_acctbal": DOUBLE,
        "c_mktsegment": STRING,
    },
    "supplier": {"s_suppkey": INT, "s_name": STRING, "s_nationkey": INT, "s_acctbal": DOUBLE},
    "part": {
        "p_partkey": INT,
        "p_name": STRING,
        "p_brand": STRING,
        "p_type": STRING,
        "p_size": INT,
        "p_retailprice": DOUBLE,
    },
    "nation": {"n_nationkey": INT, "n_name": STRING, "n_regionkey": INT},
    "region": {"r_regionkey": INT, "r_name": STRING},
    "events": {
        "event_id": INT,
        "ts": TIMESTAMP,
        "user_id": INT,
        "event_type": STRING,
        "value": DOUBLE,
        "props": STRING,
    },
    "documents": {"doc_id": INT, "text": STRING, "lang": STRING, "source": STRING, "n_chars": INT},
}


def tags_from_spark_schema(df) -> dict[str, str]:
    """Infer canon tags from a Spark DataFrame's schema."""
    out = {}
    for f in df.schema.fields:
        t = f.dataType.typeName()
        if t in ("long", "integer", "short", "byte"):
            out[f.name] = INT
        elif t in ("double", "float", "decimal"):
            out[f.name] = DOUBLE
        elif t in ("timestamp", "timestamp_ntz"):  # parquet without TZ loads as NTZ in Spark 4
            out[f.name] = TIMESTAMP
        elif t == "binary":
            out[f.name] = BINARY
        else:
            out[f.name] = STRING
    return out


def table_canon(table: str, cols: list[str], engine: str) -> str:
    tags = TABLE_TAGS[table]
    return row_canon([(c, tags[c]) for c in cols], engine)
