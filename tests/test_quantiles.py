"""Per-group discrete quantiles: the window-rank form must pick the exact
value at row ceil(p·n/100) of each sorted group."""

import math

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_quantiles_match_sorted_pick(spark):
    from tikv_data_compare_spark.queries import QUANTILE_PCTS, _dc, _load, q_quantiles

    got = {r["o_orderpriority"]: r.asDict() for r in q_quantiles(spark, SF_DIR).collect()}

    rows = (
        _load(spark, SF_DIR, "orders")
        .select("o_orderpriority", F.expr(_dc("o_totalprice")).alias("c"))
        .collect()
    )
    groups: dict[str, list[int]] = {}
    for r in rows:
        groups.setdefault(r["o_orderpriority"], []).append(r["c"])
    assert set(got) == set(groups)
    for prio, vals in groups.items():
        vals.sort()
        n = len(vals)
        g = got[prio]
        assert g["n"] == n
        assert g["min_c"] == vals[0]
        assert g["max_c"] == vals[-1]
        for p in QUANTILE_PCTS:
            # ceil(p*n/100) as (p*n + 99) DIV 100, 1-indexed
            assert g[f"p{p}_c"] == vals[(p * n + 99) // 100 - 1], (prio, p)


def test_quantile_position_formula():
    for n in (1, 2, 3, 99, 100, 101, 1000):
        for p in (50, 90, 99):
            assert (p * n + 99) // 100 == math.ceil(p * n / 100)
