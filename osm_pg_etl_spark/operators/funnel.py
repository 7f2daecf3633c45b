"""Ordered conversion funnels over event streams.

Extension beyond the reference surface (the events table has no analog in
osm-pg-etl): the standard product-analytics primitive — per user, the
earliest chain of events matching an ordered step list, each step strictly
after the previous one, optionally within a window of the first step.

Scale shape: one filtered min-aggregation per step plus an equi-join on
``user_col`` between consecutive steps — every shuffle is keyed on the
user, partial aggregation is map-side-combinable, and nothing is
quadratic in events per user (unlike a self-join-per-step formulation).
Deterministic: every step time is a ``min`` over a set.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(events: DataFrame, steps: Sequence[str],
                 user_col: str = "user_id", type_col: str = "event_type",
                 ts_col: str = "ts",
                 within_seconds: int | None = None) -> DataFrame:
    """Per user: ``t_1 … t_n`` — the earliest strictly-increasing chain of
    timestamps matching ``steps``, greedily minimal at each step (the
    standard funnel semantics: earliest qualifying event per step), plus
    ``steps_completed``. Users who never performed ``steps[0]`` are
    absent; later steps are NULL where the chain stops.

    ``within_seconds`` bounds every later step relative to ``t_1``
    (timestamp-interval arithmetic, no epoch casts — identical in any
    engine). The greedy chain is NOT a full subsequence search: an
    earlier-step choice is never revisited, which matches the common
    funnel definition and keeps the computation one pass per step.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    out = (events.where(F.col(type_col) == steps[0])
           .groupBy(user_col).agg(F.min(ts_col).alias("t_1")))
    for i, step in enumerate(steps[1:], start=2):
        cand = (events.where(F.col(type_col) == step)
                .select(user_col, F.col(ts_col).alias("_ts"))
                .join(out.select(user_col,
                                 F.col(f"t_{i - 1}").alias("_prev"),
                                 F.col("t_1").alias("_t1")), user_col)
                .where(F.col("_ts") > F.col("_prev")))
        if within_seconds is not None:
            cand = cand.where(
                F.col("_ts") <= F.col("_t1")
                + F.expr(f"INTERVAL {int(within_seconds)} SECOND"))
        nxt = cand.groupBy(user_col).agg(F.min("_ts").alias(f"t_{i}"))
        out = out.join(nxt, user_col, "left")
    done = F.lit(1)
    for i in range(2, len(steps) + 1):
        done = done + F.when(F.col(f"t_{i}").isNotNull(), 1).otherwise(0)
    return out.withColumn("steps_completed", done.cast("int"))


def funnel_summary(events: DataFrame, steps: Sequence[str],
                   user_col: str = "user_id", type_col: str = "event_type",
                   ts_col: str = "ts",
                   within_seconds: int | None = None) -> DataFrame:
    """Aggregate conversion table: one row per funnel step with the number
    of users reaching it — the chart-ready drop-off view."""
    per_user = funnel_steps(events, steps, user_col, type_col, ts_col,
                            within_seconds)
    counts = per_user.agg(*[
        F.sum(F.when(F.col("steps_completed") >= i, 1).otherwise(0))
        .alias(f"_c{i}") for i in range(1, len(steps) + 1)]).first()
    rows = [(i, steps[i - 1], int(counts[f"_c{i}"]))
            for i in range(1, len(steps) + 1)]
    return events.sparkSession.createDataFrame(
        rows, "step int, event_type string, n_users long")


def retention_cohorts(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts",
                      period: str = "week") -> DataFrame:
    """Cohort retention matrix: users are cohorted by the period of their
    first event; each (cohort, period_offset) cell counts the cohort's
    users active in that later period. Returns
    ``(cohort, period_offset, n_users)``.

    Two shuffles: first-activity min per user, then a distinct count per
    (cohort, period) — both keyed small aggregations; the events table is
    scanned once per side of one user-keyed broadcast-or-shuffle join.
    ``period`` is any ``date_trunc`` unit (week/month/day).
    """
    first = (events.groupBy(user_col)
             .agg(F.date_trunc(period, F.min(ts_col)).alias("_cohort")))
    active = events.select(
        user_col, F.date_trunc(period, F.col(ts_col)).alias("_period"))
    div = {"day": 86400, "week": 7 * 86400}.get(period)
    joined = active.join(first, user_col)
    if div is not None:
        off = (F.col("_period").cast("long")
               - F.col("_cohort").cast("long")) / div
    else:  # month and coarser are not fixed-width: count month steps
        off = (F.months_between("_period", "_cohort"))
    return (joined
            .groupBy(F.col("_cohort").alias("cohort"),
                     F.round(off).cast("int").alias("period_offset"))
            .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
            .orderBy("cohort", "period_offset"))
