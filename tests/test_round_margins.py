"""Deterministic rounding-margin audit pin (r15, VERDICT r14 task 2).

SURVEY §8 (r14) defended the gated ``ROUND(10000.0·int/int)`` canon sites
with a probabilistic argument (~2e-5 expected cross-engine flips per run).
``tools/audit_round_sites.py`` replaces it with a measurement: every
(num, den) pair each gated site computes over the driver's sf0.01 gate
corpus is enumerated and its exact distance from the nearest ``.5``
rounding boundary is computed with ``fractions.Fraction``.  This test pins:

- the audit covers every declared site and each enumerates ≥1 pair;
- every non-half margin clears MARGIN_FLOOR (1e-9, >200× the ≤4.4e-12
  two-op IEEE-double error bound) → both engines' doubles provably land
  on the same side of every boundary → zero flip probability;
- the measured global minimum (1/198 at r15) keeps an order-of-magnitude
  headroom over 1/1000, so a fixture regeneration that pushed a site near
  a boundary would trip here before it could flake the driver gate.

Exact halves are counted but not margin-constrained: Spark ROUND
(HALF_UP) and DuckDB round() both take positive halves away from zero,
and a representable ``.5`` double is exact — SURVEY §8's convention
argument, unchanged.
"""

from __future__ import annotations

import os
import sys
from fractions import Fraction

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.audit_round_sites import MARGIN_FLOOR, run_audit, site_sql

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def audit():
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"fixture dir {SF_DIR} missing")
    os.environ.setdefault("SPARK_GRAFT_AUDIT_THREADS", "4")
    return run_audit(SF_DIR)


def test_every_declared_site_is_audited(audit):
    assert set(audit["sites"]) == set(site_sql())


def test_every_site_enumerates_pairs(audit):
    for name, s in audit["sites"].items():
        assert s["n"] > 0, f"site {name} enumerated no (num, den) pairs"


def test_every_margin_clears_the_deterministic_floor(audit):
    for name, s in audit["sites"].items():
        if s["min_margin_exact"] is None:
            continue  # all pairs exact halves — convention-safe
        m = Fraction(s["min_margin_exact"])
        assert m > MARGIN_FLOOR, (
            f"site {name}: min margin {s['min_margin_exact']} within the "
            f"double-evaluation flip zone (worst pair {s['worst_pair']})"
        )
    assert audit["deterministic"]


def test_global_minimum_keeps_headroom(audit):
    # measured 1/198 ≈ 5.05e-3 at r15; 1/1000 leaves fixture-regeneration
    # slack while still sitting six orders of magnitude above the flip zone
    assert Fraction(audit["global_min_margin_exact"]) > Fraction(1, 1000)


def test_analytic_floor_consistency(audit):
    # sanity on the audit itself: a non-half reduced rational p/q is at
    # least 1/(2q) from every half-integer boundary
    for name, s in audit["sites"].items():
        if s["min_margin_exact"] is None:
            continue
        assert Fraction(s["min_margin_exact"]) >= Fraction(1, 2 * s["max_den"]), name
