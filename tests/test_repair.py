"""repair_plan / apply_repair: the reconciliation invariant.

The plan produced from diff(src, dst) must, when applied to dst, reproduce
src exactly — for mutations, inserts, deletes, and NULL payloads.  The
metamorphic fuzz round at the bottom extends the fixed cases with seeded
random mutation specs (SURVEY §5.3).
"""

import random

import pytest
from pyspark.sql import functions as F

from tikv_data_compare_spark.model import Keyed
from tikv_data_compare_spark.operators.checksum import checksum_verdict
from tikv_data_compare_spark.operators.diff import (
    ACTION_DELETE,
    ACTION_UPSERT,
    apply_repair,
    diff,
    repair_plan,
)

SCHEMA = "k long, s string, v double"


def _keyed(spark, rows):
    return Keyed.of(spark.createDataFrame(rows, SCHEMA), keys=("k",))


def test_repair_plan_actions(spark):
    src = _keyed(spark, [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)])
    dst = _keyed(spark, [(1, "a", 10.0), (2, "x", 20.0), (4, "d", 40.0)])
    plan = {r["k"]: r for r in repair_plan(src, dst).collect()}
    assert plan[2]["action"] == ACTION_UPSERT and plan[2]["s"] == "b"
    assert plan[3]["action"] == ACTION_UPSERT and plan[3]["v"] == 30.0
    assert plan[4]["action"] == ACTION_DELETE
    assert plan[4]["s"] is None and plan[4]["v"] is None
    assert set(plan) == {2, 3, 4}  # untouched key 1 is absent


def test_apply_repair_reproduces_src(spark):
    src = _keyed(spark, [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (5, None, 50.0)])
    dst = _keyed(
        spark,
        [(1, "a", 10.0), (2, "b", 99.0), (4, "d", 40.0), (5, "zz", 50.0), (6, None, None)],
    )
    plan = repair_plan(src, dst)
    repaired = apply_repair(dst, plan)
    assert diff(src, Keyed.of(repaired, keys=("k",))).count() == 0
    assert sorted(repaired.collect()) == sorted(src.df.collect())


def test_repair_plan_empty_when_equal(spark):
    src = _keyed(spark, [(1, "a", 10.0), (2, None, None)])
    dst = _keyed(spark, [(1, "a", 10.0), (2, None, None)])
    assert repair_plan(src, dst).count() == 0


N_SPECS = 24
N_BASE = 200


@pytest.fixture(autouse=True)
def _narrow_shuffles(spark):
    """Tiny frames through many joins: 32-wide shuffles are pure scheduler
    overhead at this size."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", old)


def test_metamorphic_mutation_specs(spark):
    """Metamorphic fuzz for the comparison core (VERDICT r6 #5): N seeded
    random mutation specs — k updates (some to NULL), j inserts, m deletes —
    and for EACH spec:

    - diff(src, dst) reports exactly (changed=k, only_src=m, only_dst=j);
    - checksum equality holds iff the diff is empty;
    - apply_repair(dst, repair_plan(src, dst)) == src exactly.

    Spec 0 is pinned to the identity mutation so the checksum-equal branch
    is always exercised.
    """
    rng0 = random.Random(12345)
    base_rows = [
        (i, f"s{rng0.randrange(10**6)}", round(rng0.uniform(0, 1000), 3))
        for i in range(N_BASE)
    ]
    src = Keyed.of(spark.createDataFrame(base_rows, SCHEMA), keys=("k",))
    src.df.cache().count()

    for spec in range(N_SPECS):
        rng = random.Random(7000 + spec)
        if spec == 0:
            k = j = m = 0
        else:
            k, j, m = rng.randrange(0, 15), rng.randrange(0, 15), rng.randrange(0, 15)
        keys = [r[0] for r in base_rows]
        upd = set(rng.sample(keys, k))
        dele = set(rng.sample([x for x in keys if x not in upd], m))
        dst_rows = []
        for kk, s, v in base_rows:
            if kk in dele:
                continue
            if kk in upd:
                # three mutation shapes: string drift, NULL-out, value bump
                shape = rng.randrange(3)
                if shape == 0:
                    dst_rows.append((kk, s + "_mut", v))
                elif shape == 1:
                    dst_rows.append((kk, None, v))
                else:
                    dst_rows.append((kk, s, (v or 0.0) + 1.0))
            else:
                dst_rows.append((kk, s, v))
        dst_rows += [(10_000 + spec * 100 + t, f"new{t}", float(t)) for t in range(j)]
        dst = Keyed.of(spark.createDataFrame(dst_rows, SCHEMA), keys=("k",))

        by_status = {
            r["status"]: r["n"]
            for r in diff(src, dst)
            .groupBy("status")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert by_status.get("changed", 0) == k, (spec, by_status)
        assert by_status.get("only_src", 0) == m, (spec, by_status)
        assert by_status.get("only_dst", 0) == j, (spec, by_status)
        # checksum equality iff the diff is empty (collision-free fixture)
        assert checksum_verdict(src, dst)["equal"] == (k + j + m == 0), spec
        # reconciliation inverse
        repaired = apply_repair(dst, repair_plan(src, dst))
        assert sorted(repaired.collect()) == sorted(src.df.collect()), spec

    src.df.unpersist()


def test_repair_plan_typed_null_payloads(spark):
    src = _keyed(spark, [(1, "a", 10.0)])
    dst = _keyed(spark, [(2, "b", 20.0)])
    plan = repair_plan(src, dst)
    # delete rows keep src's payload types, so the union is type-stable
    assert dict(plan.dtypes)["v"] == "double"
    assert dict(plan.dtypes)["s"] == "string"
    rows = plan.filter(F.col("action") == ACTION_DELETE).collect()
    assert len(rows) == 1 and rows[0]["k"] == 2
