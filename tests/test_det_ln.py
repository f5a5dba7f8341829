"""Cross-engine bit-parity of sqlgen.det_ln / sqlgen.frozen_ln_c.

The r12 driver run recorded the `sampling` correctness row red while every
local replay passed: the frozen cost ROUND(LN(x)*1e6) depends on the engine
LN's last ulp, which is implementation-defined (JVM Math.log vs libm log)
and therefore host-coupled.  det_ln replaces it with a sqrt-chain + atanh
series built ONLY from IEEE-754 correctly-rounded operations, so the same
SQL text must produce the identical binary64 — and frozen BIGINT — in
Spark and DuckDB on ANY host.  These tests pin that contract over every
frozen-log input domain in the repo.
"""

import math
import struct

import duckdb
import pytest

from tikv_data_compare_spark.functions import sqlgen

EXPR = sqlgen.det_ln("r")
FROZ = sqlgen.frozen_ln_c("r")


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


def _duck(sql: str):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def _spark_vs_duck(spark, gen_spark_df, duck_from_sql: str):
    """Collect (key, double, frozen) from both engines, compare bitwise."""
    s_rows = {r[0]: (r[1], r[2]) for r in gen_spark_df.collect()}
    d_rows = {r[0]: (r[1], r[2]) for r in _duck(duck_from_sql)}
    assert s_rows.keys() == d_rows.keys()
    bad = [
        k
        for k in s_rows
        if _bits(s_rows[k][0]) != _bits(d_rows[k][0]) or s_rows[k][1] != d_rows[k][1]
    ]
    assert bad == [], f"{len(bad)} bit mismatches, first: {bad[:5]}"
    return s_rows


def test_u_coin_domain_bit_identical(spark):
    """All 10000 dsir_sample u-coin ratios 10000/(b+1), b in [0,10000)."""
    sdf = spark.range(10000).selectExpr(
        "id AS k", "10000.0 / (id + 1) AS r"
    ).selectExpr("k", f"{EXPR} AS v", f"{FROZ} AS c")
    rows = _spark_vs_duck(
        spark,
        sdf,
        f"""SELECT b AS k, {EXPR} AS v, {FROZ} AS c
            FROM (SELECT b, 10000.0 / (b + 1) AS r FROM range(10000) t(b))""",
    )
    # semantic accuracy: within 1e-9 absolute of the true ln
    for k, (v, _) in rows.items():
        assert abs(v - math.log(10000.0 / (k + 1))) < 1e-9


def test_dsir_ratio_domain_bit_identical(spark):
    """Smoothed-count ratios (p + 512)/(c + 1) across a 2-D sweep, the
    dsir_weights cost domain (covers ratios both sides of 1)."""
    sdf = (
        spark.range(1, 4000, 53)
        .crossJoin(spark.range(0, 6000, 67).withColumnRenamed("id", "c"))
        .selectExpr(
            "id * 100000 + c AS k",
            "(CAST(id AS DOUBLE) + 512.0) / (CAST(c AS DOUBLE) + 1.0) AS r",
        )
        .selectExpr("k", f"{EXPR} AS v", f"{FROZ} AS c")
    )
    _spark_vs_duck(
        spark,
        sdf,
        f"""SELECT p * 100000 + c AS k, {EXPR} AS v, {FROZ} AS fc FROM (
              SELECT p, c,
                     (CAST(p AS DOUBLE) + 512.0) / (CAST(c AS DOUBLE) + 1.0) AS r
              FROM range(1, 4000, 53) t(p), range(0, 6000, 67) u(c))""",
    )


def test_extreme_magnitudes_bit_identical(spark):
    """Magnitude extremes of every frozen-log domain (idf at 100 TB doc
    counts, tiny sub-1 LM ratios) plus exact-1 and near-1 inputs."""
    vals = [
        1.0, 1.0 + 2 ** -40, 1.0 - 2 ** -40, 0.5, 2.0, 1e-12, 1e-6,
        0.9999999, 1.0000001, 3.0, 10.0, 9999.5, 1e6, 1e12, 1e18, 2.5e-7,
    ]
    lits = ", ".join(
        f"({i}, CAST('{v!r}' AS DOUBLE))" for i, v in enumerate(vals)
    )
    sdf = spark.sql(
        f"SELECT k, {EXPR} AS v, {FROZ} AS c FROM (VALUES {lits}) AS t(k, r)"
    )
    rows = _spark_vs_duck(
        spark,
        sdf,
        f"SELECT k, {EXPR} AS v, {FROZ} AS c FROM (VALUES {lits}) t(k, r)",
    )
    assert len(rows) == len(vals)


def test_accuracy_against_python_math():
    """det_ln tracks math.log to <= 1e-9 absolute over its documented
    domain |ln(x)| <= 60 — semantic sanity, determinism never depends on
    it (both engines share whatever approximation error exists)."""
    rows = _duck(
        f"""SELECT r, {EXPR} AS v FROM (
              SELECT exp(e / 10.0) AS r FROM range(-600, 601, 7) t(e))"""
    )
    assert len(rows) > 100
    for r, v in rows:
        assert abs(v - math.log(r)) <= 1e-9, (r, v, math.log(r))


def test_frozen_ln_c_is_bigint_and_round_half_up():
    """FLOOR(v*scale + 0.5) freeze: spot-pin a few integers (DuckDB side;
    the bit-parity tests above carry the cross-engine guarantee)."""
    rows = _duck(
        f"SELECT {sqlgen.frozen_ln_c('r')} FROM (SELECT CAST(2.718281828459045 AS DOUBLE) AS r)"
    )
    assert rows[0][0] == 999999 or rows[0][0] == 1000000
    # ln(1) == 0 exactly
    assert _duck(f"SELECT {sqlgen.frozen_ln_c('r')} FROM (SELECT 1.0 AS r)")[0][0] == 0
    # sign branch: ln(1/e) ~= -1e6
    neg = _duck(
        f"SELECT {sqlgen.frozen_ln_c('r')} FROM (SELECT CAST(0.36787944117144233 AS DOUBLE) AS r)"
    )[0][0]
    assert abs(neg + 1000000) <= 1


def test_no_decimal_feeds_frozen_log_paths(spark, documents):
    """The r13 driver red, root-caused in the r13 verdict: Spark typed a
    det_ln input quotient DECIMAL(34,12) — an extra rounding to 12 decimal
    digits — where DuckDB typed the same text DOUBLE, so the two engines
    fed det_ln different binary64s and the frozen integers flipped on the
    driver host while matching locally.  Every frame on a frozen-log path
    must be decimal-free end to end: the documents-table operators have no
    decimal source columns, so ANY ``cast(... as decimal`` in the analyzed
    plan is a smoothing-quotient regression (`x * 1.0 / y` instead of
    `CAST(x AS DOUBLE) / CAST(y AS DOUBLE)`, or a driver-side literal
    table skipped)."""
    from pyspark.sql import functions as F

    from tikv_data_compare_spark.operators.sampling import (
        dsir_sample,
        dsir_weights,
    )
    from tikv_data_compare_spark.operators.text import (
        bm25_topk,
        ngram_lm_score,
        tfidf_top_terms,
    )

    docs = documents.select("doc_id", "lang", "text").limit(200)
    target = docs.filter(F.col("lang") == "en")
    q = spark.createDataFrame(
        [(1, "data quality")], "query_id long, qtext string"
    )
    frames = {
        "dsir_weights": dsir_weights(docs, target, n_buckets=64),
        "dsir_sample": dsir_sample(docs, target, n_buckets=64),
        "tfidf_top_terms": tfidf_top_terms(docs),
        "ngram_lm_score": ngram_lm_score(docs),
        "bm25_topk": bm25_topk(docs, q),
    }
    bad = []
    for name, df in frames.items():
        plan = df._jdf.queryExecution().analyzed().toString()
        if "decimal" in plan.lower():
            bad.append(name)
    assert bad == [], f"decimal type in frozen-log plan(s): {bad}"


def test_dsir_literal_tables_agree_cross_engine(spark, documents):
    """The r14 zero-float DSIR gate moves ALL floating point to the driver
    (sqlgen.frozen_ln_c_py literals); the only cross-engine surface left
    is the integer bucket counts — Spark computes its own (collected in
    dsir_weights), the oracle generation computes DuckDB's
    (queries_ext._dsir_literals).  If tokenization/md5/hexfold ever
    diverged between the two pipelines, the literals would differ and the
    driver row would go red — this test pins count parity directly: the
    wtab the Spark operator would build from its counts must equal the
    wtab embedded in the oracle, bucket by bucket."""
    import os

    from pyspark.sql import functions as F

    from tikv_data_compare_spark.operators.sampling import _dsir_feats
    from tikv_data_compare_spark.queries_ext import _dsir_literals

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    docs = documents.select("doc_id", "lang", "text")
    raw = _dsir_feats(docs, "doc_id", "text", 512)
    tgt = _dsir_feats(docs.filter(F.col("lang") == "en"), None, "text", 512)
    cr = {int(r["_b"]): int(r["c"]) for r in raw.groupBy("_b").count().withColumnRenamed("count", "c").collect()}
    ct = {int(r["_b"]): int(r["c"]) for r in tgt.groupBy("_b").count().withColumnRenamed("count", "c").collect()}
    tr, tt = sum(cr.values()), sum(ct.values())
    spark_w = {
        b: sqlgen.frozen_ln_c_py((tr + 512) / (cr.get(b, 0) + 1))
        - sqlgen.frozen_ln_c_py((tt + 512) / (ct.get(b, 0) + 1))
        for b in range(512)
    }
    wtab_values, ucoin = _dsir_literals(sf_dir)
    duck_w = {}
    for pair in wtab_values.split("), ("):
        b, w = pair.strip("() ").split(", ")
        duck_w[int(b)] = int(w)
    assert spark_w == duck_w
    # the u-coin literal is data-independent: spot-pin its definition
    coins = [int(v) for v in ucoin.strip("[]").split(", ")]
    assert len(coins) == 10000
    assert coins[0] == sqlgen.frozen_ln_c_py(10000.0)
    assert coins[9999] == 0  # ln(10000/10000) == 0 exactly


def test_frozen_ln_c_py_rounding_convention():
    """floor(v·1e6 + 0.5) — the frozen_ln_c convention, incl. negatives."""
    assert sqlgen.frozen_ln_c_py(1.0) == 0
    assert sqlgen.frozen_ln_c_py(math.e) == 1000000
    # negative domain: ln(1/e) = -1 → -1000000 (floor(+0.5) is half-UP,
    # toward +inf, matching the SQL FLOOR(v + 0.5) freeze exactly)
    assert sqlgen.frozen_ln_c_py(1.0 / math.e) == -1000000
    assert (
        sqlgen.frozen_ln_c_py(2.0)
        == int(math.floor(math.log(2.0) * 1e6 + 0.5))
    )


def test_no_engine_ln_in_frozen_cost_operators():
    """Regression tripwire: no operator or oracle may reintroduce the
    engine LN into a frozen-cost expression (the r12 drift)."""
    import pathlib

    pkg = pathlib.Path(__file__).resolve().parent.parent / "tikv_data_compare_spark"
    offenders = []
    for p in pkg.rglob("*.py"):
        src = p.read_text()
        for i, line in enumerate(src.splitlines(), 1):
            if "ROUND(LN(" in line or "round(ln(" in line:
                offenders.append(f"{p.name}:{i}")
    assert offenders == [], offenders
