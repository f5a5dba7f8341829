#!/usr/bin/env python
"""Deterministic margin audit for every gated ``ROUND(10000.0·int/int)`` site.

SURVEY §8 (r14) left the integer-rational canon sites on a probabilistic
argument: a cross-engine rounding flip needs the true rational within
~5e-13 of a ``.5`` boundary, "≈2e-5 expected flips per driver run".  This
tool replaces that expectation with a measurement: it ENUMERATES the exact
(numerator, denominator) integer pairs each gated site computes over a
fixture directory, evaluates every ratio exactly with ``fractions.Fraction``,
and reports the minimum distance from a half-integer rounding boundary.

Why this is deterministic: both engines evaluate ``10000.0 * a / b`` in
IEEE-754 double.  Two correctly-rounded ops on exact integer inputs give an
absolute error ≤ ~2 ulp ≤ 4.4e-12 at values ≤ 1e4.  If the TRUE rational's
distance from every ``n + 1/2`` boundary exceeds 1e-9 (>200× that bound),
both engines' doubles land strictly on the same side of the boundary and
``ROUND`` agrees bit-for-bit — no probability left.  Exact halves
(distance 0) are SAFE, not risky: both engines round positive halves away
from zero (Spark ROUND: HALF_UP; DuckDB round(): half away from zero), and
the double value of an exactly-representable half is exact; they are
counted separately.

The (num, den) extraction reuses the oracle's OWN CTE builders
(queries_ext.DUCK_SHINGLES, _oracle_minhash_sig_cte, _duck_shingles_for,
_duck_minhash_sig_for, sqlgen.split_words) so the enumerated pairs cannot
drift from the gated definitions.  Site → gated source map:

  mean_word_len     queries_ext ORACLE_TEXT_STATS (:913) / text.py:50
  punct_ratio       queries_ext :1213,:1217,:2564 / text.py:172
  stopword_ratio    queries_ext :1214,:1218,:2565 / text.py:173
  dup_word_frac     queries_ext :1244,:2581 / text.py:341
  top_bigram_frac   queries_ext :1245,:2582 / text.py:345
  jaccard_band_pairs  ORACLE_DEDUP_MINHASH_PAIRS (:294) + curation losers
                      (:2606, a subset of the same pair set) / dedup.py:374
  contam_hit_frac   ORACLE_TEXT_FINGERPRINTS conta (:1489) / text.py:288
  fuzzy_probe_jaccard ORACLE_TEXT_FINGERPRINTS fz_j (:1602) / text.py:1588

Out of scope by design: double-typed canon sites (cosine / norm / rms
×10000) — order-fixed correctly-rounded folds, bit-identical by the
det_ln argument (SURVEY §8); pure integer-division sites (``DIV``/``//``,
e.g. skew.py:110, sampling.py:431) — exact in both engines; and
``compression_ratio_c`` (text.py:227) — pytest-gated only, recomputed by
the SAME Python ``round`` on both sides of its test.

Usage:
  python tools/audit_round_sites.py [--sites a,b,...] [sf_dir ...]
Defaults to /root/testdata/sf0.01.  Prints one JSON line per sf_dir;
exit 0 iff every enumerated non-half margin exceeds the 1e-9 floor.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from fractions import Fraction

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tikv_data_compare_spark import queries_ext as qe  # noqa: E402
from tikv_data_compare_spark.functions import sqlgen  # noqa: E402

TABLES = ["documents"]

#: deterministic-safety floor: >200× the ≤4.4e-12 two-op double error bound
MARGIN_FLOOR = Fraction(1, 10**9)

WS = sqlgen.split_words("text", sqlgen.DUCK)


def _band_cond(a: str, b: str) -> str:
    """The 4×2-perm LSH band condition shared by every minhash oracle."""
    return (
        f"(({a}.m0 = {b}.m0 AND {a}.m1 = {b}.m1) OR ({a}.m2 = {b}.m2 AND {a}.m3 = {b}.m3)"
        f" OR ({a}.m4 = {b}.m4 AND {a}.m5 = {b}.m5) OR ({a}.m6 = {b}.m6 AND {a}.m7 = {b}.m7))"
    )


def _stats_base() -> str:
    """The ORACLE_TEXT_STATS input integers (queries_ext.py ORACLE_TEXT_STATS)."""
    sw = qe._sw_list_sql(qe.ALL_STOPWORDS)
    return f"""
      SELECT doc_id,
             len({WS}) AS n_tokens,
             length(text) AS n_chars,
             length(text) - len({WS}) + 1 AS mwl_num,
             len(list_filter({WS}, x -> x IN ({sw}))) AS n_stopwords,
             length(text) - length(replace(replace(replace(text, '.', ''), ',', ''), '!', '')) AS n_punct
      FROM documents
    """


def _shingles_cte() -> str:
    """ORACLE_TEXT_FINGERPRINTS' distinct word-3-shingle set (column sh)."""
    return f"""
  SELECT DISTINCT doc_id, sh FROM (
    SELECT doc_id, unnest(CASE WHEN len(ws) >= 3
        THEN list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
        ELSE [text] END) AS sh
    FROM (SELECT doc_id, text, {WS} AS ws FROM documents)
  )
"""


def site_sql() -> dict[str, str]:
    stats = _stats_base()
    sites = {
        "mean_word_len": f"SELECT mwl_num AS num, n_tokens AS den FROM ({stats})",
        "punct_ratio": f"SELECT n_punct AS num, greatest(n_chars, 1) AS den FROM ({stats})",
        "stopword_ratio": (
            f"SELECT n_stopwords AS num, greatest(n_tokens, 1) AS den FROM ({stats})"
        ),
        "dup_word_frac": f"""
WITH wrd AS (SELECT doc_id, unnest({WS}) AS w FROM documents),
word_stats AS (SELECT doc_id, count(*) AS n_words, count(DISTINCT w) AS n_distinct
               FROM wrd GROUP BY doc_id)
SELECT n_words - n_distinct AS num, n_words AS den FROM word_stats
""",
        "top_bigram_frac": f"""
WITH big AS (
  SELECT doc_id, unnest(CASE WHEN len(ws) < 2 THEN []
         ELSE list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) END) AS bigram
  FROM (SELECT doc_id, {WS} AS ws FROM documents)
),
big_tf AS (SELECT doc_id, bigram, count(*) AS n FROM big GROUP BY doc_id, bigram)
SELECT max(n) AS num, sum(n) AS den FROM big_tf GROUP BY doc_id
""",
        "jaccard_band_pairs": f"""
WITH sig AS ({qe._oracle_minhash_sig_cte()}),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND {_band_cond('a', 'b')}
),
words AS ({qe.DUCK_SHINGLES}),
sizes AS (SELECT doc_id, count(*) AS n FROM words GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS ninter
  FROM cand c JOIN words wa ON wa.doc_id = c.doc_a
       JOIN words wb ON wb.doc_id = c.doc_b AND wa.w = wb.w
  GROUP BY c.doc_a, c.doc_b
)
SELECT coalesce(i.ninter, 0) AS num,
       sa.n + sb.n - coalesce(i.ninter, 0) AS den
FROM cand c
JOIN sizes sa ON sa.doc_id = c.doc_a JOIN sizes sb ON sb.doc_id = c.doc_b
LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
""",
        "contam_hit_frac": f"""
WITH shingles AS ({_shingles_cte()}),
probe_grams AS (SELECT DISTINCT sh FROM shingles WHERE doc_id % 20 = 0)
SELECT count(p.sh) AS num, count(*) AS den
FROM shingles s LEFT JOIN probe_grams p ON p.sh = s.sh
GROUP BY s.doc_id
""",
        "fuzzy_probe_jaccard": f"""
WITH shingles AS ({_shingles_cte()}),
fzprobes AS (
  SELECT doc_id AS probe_id,
         CASE WHEN len(ws) > 2 THEN array_to_string(ws[3:], ' ')
              ELSE text END AS text
  FROM (SELECT doc_id, text, {WS} AS ws FROM documents)
  WHERE doc_id % 13 = 0
),
fz_psh AS MATERIALIZED ({qe._duck_shingles_for("SELECT probe_id, text FROM fzprobes", "probe_id")}),
fz_dsig AS MATERIALIZED ({qe._duck_minhash_sig_for("SELECT doc_id, sh AS w FROM shingles", "doc_id")}),
fz_psig AS MATERIALIZED ({qe._duck_minhash_sig_for("SELECT probe_id, w FROM fz_psh", "probe_id")}),
fz_cand AS (
  SELECT d.doc_id, p.probe_id
  FROM fz_dsig d JOIN fz_psig p ON {_band_cond('d', 'p')}
),
fz_inter AS (
  SELECT c.doc_id, c.probe_id, count(*) AS ninter
  FROM fz_cand c
  JOIN shingles wa ON wa.doc_id = c.doc_id
  JOIN fz_psh wb ON wb.probe_id = c.probe_id AND wa.sh = wb.w
  GROUP BY 1, 2
),
fz_sz_d AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY 1),
fz_sz_p AS (SELECT probe_id, count(*) AS n FROM fz_psh GROUP BY 1)
SELECT coalesce(i.ninter, 0) AS num,
       sa.n + sb.n - coalesce(i.ninter, 0) AS den
FROM fz_cand c
JOIN fz_sz_d sa ON sa.doc_id = c.doc_id
JOIN fz_sz_p sb ON sb.probe_id = c.probe_id
LEFT JOIN fz_inter i ON i.doc_id = c.doc_id AND i.probe_id = c.probe_id
""",
    }
    return sites


def audit_site(con, sql: str) -> dict:
    """Exact-margin scan of one site's (num, den) enumeration."""
    pairs = con.execute(sql).fetchall()
    n = exact_halves = 0
    min_margin: Fraction | None = None
    max_den = 0
    worst = None
    for num, den in pairs:
        if num is None or den is None or den == 0:
            continue
        n += 1
        max_den = max(max_den, int(den))
        r = Fraction(10000 * int(num), int(den))
        frac = r - (r.numerator // r.denominator)
        d = abs(frac - Fraction(1, 2))
        if d == 0:
            exact_halves += 1
        elif min_margin is None or d < min_margin:
            min_margin = d
            worst = [int(num), int(den)]
    return {
        "n": n,
        "exact_halves": exact_halves,
        "min_margin": float(min_margin) if min_margin is not None else None,
        "min_margin_exact": str(min_margin) if min_margin is not None else None,
        "worst_pair": worst,
        "max_den": max_den,
        # analytic floor: a non-half reduced rational p/q is ≥ 1/(2q) from
        # every half-integer boundary, so min_margin ≥ 1/(2·max_den) always
        "analytic_floor": 1.0 / (2 * max_den) if max_den else None,
    }


def run_audit(sf_dir: str, only: set[str] | None = None) -> dict:
    import duckdb

    con = duckdb.connect()
    thr = os.environ.get("SPARK_GRAFT_AUDIT_THREADS", "")
    if thr:
        con.execute(f"SET threads={int(thr)}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(sf_dir, t)}.parquet')"
        )
    out: dict = {"sf_dir": sf_dir, "sites": {}, "floor": float(MARGIN_FLOOR)}
    global_min: Fraction | None = None
    for name, sql in site_sql().items():
        if only and name not in only:
            continue
        t0 = time.time()
        rec = audit_site(con, sql)
        rec["sec"] = round(time.time() - t0, 2)
        out["sites"][name] = rec
        if rec["min_margin_exact"] is not None:
            m = Fraction(rec["min_margin_exact"])
            if global_min is None or m < global_min:
                global_min = m
    out["global_min_margin"] = float(global_min) if global_min is not None else None
    out["global_min_margin_exact"] = str(global_min) if global_min is not None else None
    out["deterministic"] = bool(global_min is not None and global_min > MARGIN_FLOOR)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dirs", nargs="*", default=None)
    ap.add_argument("--sites", default="", help="comma-separated site subset")
    args = ap.parse_args()
    dirs = args.sf_dirs or ["/root/testdata/sf0.01"]
    only = {s for s in args.sites.split(",") if s} or None
    ok = True
    for d in dirs:
        rec = run_audit(d, only)
        print(json.dumps(rec))
        ok = ok and rec["deterministic"]
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
