"""repair_plan / apply_repair: the reconciliation invariant.

The plan produced from diff(src, dst) must, when applied to dst, reproduce
src exactly — for mutations, inserts, deletes, and NULL payloads.
"""

from pyspark.sql import functions as F

from tikv_data_compare_spark.model import Keyed
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


def test_repair_plan_typed_null_payloads(spark):
    src = _keyed(spark, [(1, "a", 10.0)])
    dst = _keyed(spark, [(2, "b", 20.0)])
    plan = repair_plan(src, dst)
    # delete rows keep src's payload types, so the union is type-stable
    assert dict(plan.dtypes)["v"] == "double"
    assert dict(plan.dtypes)["s"] == "string"
    rows = plan.filter(F.col("action") == ACTION_DELETE).collect()
    assert len(rows) == 1 and rows[0]["k"] == 2
