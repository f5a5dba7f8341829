"""Funnel and gap-profile operators on constructed timelines."""

from pyspark.sql import functions as F

from tikv_data_compare_spark.operators.events import funnel_counts, funnel_times, gap_profile

STAGES = ["signup", "view", "click", "purchase"]
SCHEMA = "user_id long, event_type string, ms long"


def _events(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_funnel_full_and_partial_paths(spark):
    rows = [
        # user 1: complete funnel in order
        (1, "signup", 0), (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # user 2: click/purchase exist but no view AFTER signup -> stops at signup
        (2, "view", 0), (2, "signup", 10), (2, "click", 20), (2, "purchase", 30),
        # user 3: skips click -> stops at view even though purchase exists
        (3, "signup", 0), (3, "view", 10), (3, "purchase", 20),
        # user 4: never signs up -> reaches nothing
        (4, "purchase", 0),
    ]
    out = funnel_counts(_events(spark, rows), STAGES).collect()[0]
    assert out["n_users"] == 4
    assert out["n_signup"] == 3
    assert out["n_view"] == 2
    assert out["n_click"] == 1
    assert out["n_purchase"] == 1


def test_funnel_same_timestamp_counts(spark):
    # at-or-after semantics: a view at the exact signup ms reaches stage 2
    rows = [(1, "signup", 5), (1, "view", 5)]
    t = funnel_times(_events(spark, rows), STAGES).collect()[0]
    assert t["t1"] == 5 and t["t2"] == 5 and t["t3"] is None


def test_funnel_cascade_uses_first_touch(spark):
    # t2 is the FIRST view >= t1, not any later one
    rows = [(1, "signup", 0), (1, "view", 50), (1, "view", 10), (1, "click", 20)]
    t = funnel_times(_events(spark, rows), STAGES).collect()[0]
    assert t["t2"] == 10
    # click at 20 is >= t2=10 -> reached
    assert t["t3"] == 20


def test_gap_profile(spark):
    rows = [
        (1, "view", 0), (1, "view", 100), (1, "view", 2_000_000),
        (2, "view", 42),  # single event: no gaps, NULL max/sum
    ]
    df = _events(spark, rows).selectExpr(
        "user_id", "ms", "monotonically_increasing_id() as event_id"
    )
    out = {r["user_id"]: r for r in gap_profile(df).collect()}
    assert out[1]["n_events"] == 3 and out[1]["n_gaps"] == 2
    assert out[1]["max_gap_ms"] == 1_999_900
    assert out[1]["sum_gap_ms"] == 100 + 1_999_900
    assert out[1]["n_long_gaps"] == 1
    assert out[2]["n_gaps"] == 0 and out[2]["max_gap_ms"] is None


def test_cohort_retention_closed_form(spark):
    """Hand-built activity: cohorts by first active day, distinct users per
    (cohort, period) — includes a user active twice on one day (counted
    once) and a second cohort."""
    from tikv_data_compare_spark.operators.events import cohort_retention

    rows = [
        (1, "2024-01-01 10:00:00"), (1, "2024-01-01 18:00:00"),  # day 0 twice
        (1, "2024-01-03 09:00:00"),                               # period 2
        (2, "2024-01-01 12:00:00"), (2, "2024-01-02 12:00:00"),  # periods 0,1
        (3, "2024-01-02 01:00:00"),                               # cohort 2
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").select(
        "user_id", F.to_timestamp("ts").alias("ts")
    )
    got = {
        (r["cohort_day_ms"], r["period_days"]): r["n_users"]
        for r in cohort_retention(df).collect()
    }
    d1 = 19723 * 86_400_000  # 2024-01-01
    d2 = d1 + 86_400_000
    assert got == {(d1, 0): 2, (d1, 1): 1, (d1, 2): 1, (d2, 0): 1}
