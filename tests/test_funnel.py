"""Conversion funnels (operators.funnel) + salted join equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))


def test_funnel_greedy_chain(spark):
    from osm_pg_etl_spark.operators.funnel import funnel_steps

    rows = [
        # user 1 completes A->B->C in order
        (1, "A", "2026-01-01 00:00:00"),
        (1, "B", "2026-01-01 01:00:00"),
        (1, "C", "2026-01-01 02:00:00"),
        # user 2: B before A only -> stops after A
        (2, "B", "2026-01-01 00:00:00"),
        (2, "A", "2026-01-01 01:00:00"),
        # user 3: A then C (no B) -> C must NOT count
        (3, "A", "2026-01-01 00:00:00"),
        (3, "C", "2026-01-01 01:00:00"),
        # user 4 never does A -> absent
        (4, "B", "2026-01-01 00:00:00"),
        # user 5: ties — B at the same instant as A is NOT strictly after
        (5, "A", "2026-01-01 00:00:00"),
        (5, "B", "2026-01-01 00:00:00"),
    ]
    got = {r["user_id"]: r for r in funnel_steps(
        _ev(spark, rows), ["A", "B", "C"]).collect()}
    assert set(got) == {1, 2, 3, 5}
    assert got[1]["steps_completed"] == 3
    assert str(got[1]["t_3"]) == "2026-01-01 02:00:00"
    assert got[2]["steps_completed"] == 1 and got[2]["t_2"] is None
    assert got[3]["steps_completed"] == 1
    assert got[5]["steps_completed"] == 1


def test_funnel_within_window(spark):
    from osm_pg_etl_spark.operators.funnel import funnel_steps

    rows = [(1, "A", "2026-01-01 00:00:00"),
            (1, "B", "2026-01-01 03:00:00")]   # 3h after first step
    within_2h = funnel_steps(_ev(spark, rows), ["A", "B"],
                             within_seconds=7200).collect()[0]
    assert within_2h["steps_completed"] == 1
    within_4h = funnel_steps(_ev(spark, rows), ["A", "B"],
                             within_seconds=14400).collect()[0]
    assert within_4h["steps_completed"] == 2


def test_funnel_summary_dropoff(spark):
    from osm_pg_etl_spark.operators.funnel import funnel_summary

    rows = [(u, "A", "2026-01-01 00:00:00") for u in range(5)] + \
           [(u, "B", "2026-01-01 01:00:00") for u in range(3)] + \
           [(0, "C", "2026-01-01 02:00:00")]
    got = {r["step"]: (r["event_type"], r["n_users"]) for r in
           funnel_summary(_ev(spark, rows), ["A", "B", "C"]).collect()}
    assert got == {1: ("A", 5), 2: ("B", 3), 3: ("C", 1)}


def test_salted_join_equals_plain_join(spark):
    from osm_pg_etl_spark.functions.skew import salted_join

    big = spark.createDataFrame(
        [(i % 3, i, float(i)) for i in range(1000)],
        "k long, rid long, v double")
    small = spark.createDataFrame(
        [(0, "zero"), (1, "one"), (9, "nine")], "k long, name string")
    plain = sorted(tuple(r) for r in big.join(small, "k").collect())
    salted = sorted(tuple(r) for r in salted_join(
        big, small, key="k", entropy_col="rid", buckets=8).collect())
    assert salted == plain
    # left join keeps unmatched big rows exactly once
    pl = sorted(tuple(r) for r in big.join(small, "k", "left").collect())
    sl = sorted(tuple(r) for r in salted_join(
        big, small, key="k", entropy_col="rid", buckets=8,
        how="left").collect())
    assert sl == pl


def test_table_profile(spark):
    from osm_pg_etl_spark.operators.profile import table_profile

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (3, "b")], "k long, v string")
    got = {r["column"]: r for r in
           table_profile(df, exact_distinct=True).collect()}
    assert got["k"]["n_rows"] == 4
    assert got["k"]["n_distinct"] == 3
    assert got["k"]["n_nulls"] == 0
    assert (got["k"]["min_repr"], got["k"]["max_repr"]) == ("1", "3")
    assert got["v"]["n_nulls"] == 1
    assert got["v"]["null_frac"] == 0.25
    assert got["v"]["n_distinct"] == 2        # NULL excluded, like pg
    assert got["k"]["distinct_ratio"] == -0.75


def test_key_skew_report(spark):
    from osm_pg_etl_spark.operators.profile import key_skew_report

    rows = [("hot",)] * 90 + [(f"k{i}",) for i in range(10)]
    df = spark.createDataFrame(rows, "k string")
    got = key_skew_report(df, "k", top=3, exact_distinct=True).collect()
    assert got[0]["key"] == "hot"
    assert got[0]["share"] == 0.9
    assert got[0]["skew_factor"] == 9.9       # 0.9 * 11 distinct keys


def test_retention_cohorts(spark):
    from osm_pg_etl_spark.operators.funnel import retention_cohorts

    rows = [
        (1, "A", "2026-01-05 10:00:00"),   # week of Jan 5 (Mon)
        (1, "A", "2026-01-13 10:00:00"),   # next week -> offset 1
        (2, "B", "2026-01-06 10:00:00"),   # same cohort, week 0 only
        (3, "A", "2026-01-14 10:00:00"),   # cohort Jan 12
    ]
    got = {(str(r["cohort"]), r["period_offset"]): r["n_users"]
           for r in retention_cohorts(_ev(spark, rows)).collect()}
    assert got == {("2026-01-05 00:00:00", 0): 2,
                   ("2026-01-05 00:00:00", 1): 1,
                   ("2026-01-12 00:00:00", 0): 1}
