"""Hand-verifiable cases for the round-4 operators: as-of join,
multi-quantile profile, duplicate n-gram spans, k-core peel."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from osm_pg_etl_spark.operators.asof import asof_join
from osm_pg_etl_spark.operators.dedup import duplicate_ngram_spans
from osm_pg_etl_spark.operators.graph_algo import k_core
from osm_pg_etl_spark.operators.stats import quantiles_by_group


def _ts(s: int):
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: clicks at t=10 (id 100), t=20 (id 101); purchases at
        # t=5 (before any click), t=20 (tie -> inclusive), t=30
        (1, 100, _ts(10), "click", 1.0),
        (1, 101, _ts(20), "click", 2.0),
        (1, 200, _ts(5), "purchase", 9.0),
        (1, 201, _ts(20), "purchase", 9.0),
        (1, 202, _ts(30), "purchase", 9.0),
        # user 2: two clicks at the SAME ts -> deterministic tie-break to
        # the greater event_id
        (2, 110, _ts(10), "click", 5.0),
        (2, 111, _ts(10), "click", 6.0),
        (2, 210, _ts(15), "purchase", 9.0),
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, "
              "event_type string, value double")


def test_asof_backward_inclusive(spark, events):
    out = asof_join(events.filter(F.col("event_type") == "purchase"),
                    events.filter(F.col("event_type") == "click"),
                    on="user_id")
    got = {r["event_id"]: r["asof_event_id"] for r in out.collect()}
    assert got == {200: None,   # no prior click
                   201: 101,    # same-ts click included
                   202: 101,
                   210: 111}    # same-ts right tie -> max event_id


def test_asof_tolerance(spark, events):
    out = asof_join(events.filter(F.col("event_type") == "purchase"),
                    events.filter(F.col("event_type") == "click"),
                    on="user_id", tolerance_s=5.0)
    got = {r["event_id"]: r["asof_event_id"] for r in out.collect()}
    # purchase 202 at t=30: click 101 at t=20 is 10 s stale -> voided;
    # purchase 210's click is exactly 5 s old -> kept (inclusive bound)
    assert got[202] is None and got[210] == 111 and got[201] == 101


def test_quantiles_by_group(spark):
    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 6)] + [("b", 10.0), ("b", 20.0)],
        "g string, x double")
    out = {r["g"]: r for r in
           quantiles_by_group(df, ["g"], "x",
                              qs=(0.25, 0.5, 0.75)).collect()}
    # group a = 1..5: PERCENTILE_CONT -> p25=2, p50=3, p75=4
    assert (out["a"]["p25"], out["a"]["p50"], out["a"]["p75"]) == (2.0, 3.0, 4.0)
    # group b = {10,20}: interpolation -> 12.5, 15, 17.5
    assert (out["b"]["p25"], out["b"]["p50"], out["b"]["p75"]) == (12.5, 15.0, 17.5)
    assert out["a"]["n_values"] == 5


def test_quantile_sketch_small_group_is_exact(spark):
    """A group with <= k rows samples EVERYTHING — the sketch must equal
    the exact quantiles bit-for-bit, with true counts carried."""
    from osm_pg_etl_spark.operators.stats import quantile_sketch_by_group

    df = spark.createDataFrame(
        [("a", i, float(v)) for i, v in enumerate(range(1, 6))]
        + [("b", 10, 10.0), ("b", 11, 20.0)],
        "g string, rid long, x double")
    out = {r["g"]: r for r in quantile_sketch_by_group(
        df, ["g"], "x", hash_cols=["rid"], k=256,
        qs=(0.25, 0.5, 0.75)).collect()}
    assert (out["a"]["p25"], out["a"]["p50"], out["a"]["p75"]) == (2.0, 3.0, 4.0)
    assert (out["a"]["n_values"], out["a"]["n_sampled"]) == (5, 5)
    assert (out["b"]["p25"], out["b"]["p50"], out["b"]["p75"]) == (12.5, 15.0, 17.5)
    assert (out["b"]["n_values"], out["b"]["n_sampled"]) == (2, 2)


def test_quantile_sketch_error_bound_and_merge_invariance(spark):
    """Error bound vs exact on a 20k-row group: each sketched pXX must lie
    within the exact [p-3σ, p+3σ] band, σ = sqrt(p(1-p)/k) (the KMV
    uniform-sample bound). And the result must be IDENTICAL under any
    repartitioning / salt_parts (mergeability + determinism: bottom-k by
    a fixed hash is a pure function of the data)."""
    import math

    from pyspark.sql import functions as F

    from osm_pg_etl_spark.operators.stats import (
        quantile_sketch_by_group, quantiles_by_group)

    df = (spark.range(20_000)
          .select(F.lit("g").alias("g"), F.col("id"),
                  # deterministic pseudo-uniform values in [0, 1000)
                  (F.pmod(F.xxhash64("id"), 100_000) / 100.0).alias("x")))
    k = 256
    qs = (0.25, 0.5, 0.75, 0.9, 0.99)
    sk = quantile_sketch_by_group(df, ["g"], "x", hash_cols=["id"],
                                  k=k, qs=qs).collect()[0]
    assert sk["n_values"] == 20_000 and sk["n_sampled"] == k
    for p in qs:
        sigma = math.sqrt(p * (1 - p) / k)
        lo_p, hi_p = max(p - 3 * sigma, 0.0), min(p + 3 * sigma, 1.0)
        band = quantiles_by_group(df, ["g"], "x", qs=(lo_p, hi_p),
                                  scale=6).collect()[0]
        name = f"p{round(p * 100)}"
        assert band[0 + 1] <= sk[name] <= band[1 + 1], \
            (name, sk[name], band[1], band[2])

    again = quantile_sketch_by_group(df.repartition(17), ["g"], "x",
                                     hash_cols=["id"], k=k, qs=qs,
                                     salt_parts=5).collect()[0]
    assert again == sk


def test_quantiles_by_group_approx_method(spark):
    """r11: method='approx' (percentile_approx, the 100-TB default) —
    same output shape, rank error <= 1/accuracy vs exact; bad method
    names fail loudly."""
    import pytest
    from pyspark.sql import functions as F

    df = (spark.range(20_000)
          .select(F.lit("g").alias("g"),
                  (F.pmod(F.xxhash64("id"), 100_000) / 100.0).alias("x")))
    qs = (0.25, 0.5, 0.75, 0.9, 0.99)
    acc = 1000
    ex = quantiles_by_group(df, ["g"], "x", qs=qs, scale=6).collect()[0]
    ap = quantiles_by_group(df, ["g"], "x", qs=qs, scale=6,
                            method="approx", accuracy=acc).collect()[0]
    assert ap["n_values"] == ex["n_values"] == 20_000
    for p in qs:
        # GK bound: the returned value's rank is within n/accuracy of
        # the target rank -> it must lie inside the exact quantile band
        # at p +/- 2/accuracy (slack x2 for interpolation)
        lo_p = max(p - 2.0 / acc, 0.0)
        hi_p = min(p + 2.0 / acc, 1.0)
        band = quantiles_by_group(df, ["g"], "x", qs=(lo_p, hi_p),
                                  scale=6).collect()[0]
        name = f"p{round(p * 100)}"
        assert band[1] <= ap[name] <= band[2], (name, ap[name])
    with pytest.raises(ValueError, match="method"):
        quantiles_by_group(df, ["g"], "x", method="bogus")


def test_quantiles_by_group_auto_crossover(spark):
    """r12 (VERDICT task 4): method='auto' resolves by Catalyst's input
    size estimate — exact below the threshold (hash-reproducible, what
    the sf0.01 gate sees), percentile_approx above it (the 100-TB
    memory-safe path). The resolution is visible in the optimized plan."""
    from pyspark.sql import functions as F

    from osm_pg_etl_spark.operators.stats import _plan_size_bytes

    df = (spark.range(5_000)
          .select(F.lit("g").alias("g"),
                  (F.col("id") % 97).cast("double").alias("x")))
    size = _plan_size_bytes(df)
    assert size is not None and size > 0

    def plan(method, thresh):
        return quantiles_by_group(
            df, ["g"], "x", method=method, auto_approx_bytes=thresh
        )._jdf.queryExecution().optimizedPlan().toString()

    # small data (threshold far above the estimate) -> exact aggregate
    assert "percentile_approx" not in plan("auto", size * 100)
    # "big" data (threshold below the estimate) -> approx sketch
    assert "percentile_approx" in plan("auto", max(size // 100, 1))
    # and auto == exact numerically on the small side
    auto = quantiles_by_group(df, ["g"], "x").collect()[0]
    exact = quantiles_by_group(df, ["g"], "x", method="exact").collect()[0]
    assert auto == exact


def test_duplicate_ngram_spans(spark):
    shared = "one two three four"          # the only cross-doc 4-gram
    docs = [
        (1, shared + " five"),             # windows: 2, dup: 1
        (2, "zero " + shared),             # windows: 2, dup: 1
        (3, "all unique words here now"),  # windows: 2, dup: 0
        (4, "short text"),                 # < n tokens -> 0 windows
    ]
    out = {r["doc_id"]: r for r in
           duplicate_ngram_spans(
               spark.createDataFrame(docs, "doc_id long, text string"),
               n=4).collect()}
    assert (out[1]["n_windows"], out[1]["n_dup_windows"]) == (2, 1)
    assert (out[2]["n_windows"], out[2]["n_dup_windows"]) == (2, 1)
    assert (out[3]["n_windows"], out[3]["n_dup_windows"]) == (2, 0)
    assert (out[4]["n_windows"], out[4]["dup_frac"]) == (0, 0.0)
    assert out[1]["dup_frac"] == 0.5


def test_k_core_peels_pendants(spark):
    # triangle 1-2-3 with a pendant path 3-4-5 and an isolated edge 6-7
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (6, 7)],
        "src long, dst long")
    out, rounds = k_core(edges, k=2, max_rounds=10, return_rounds=True)
    got = {r["node"]: r["core_deg"] for r in out.collect()}
    assert got == {1: 2, 2: 2, 3: 2}      # only the triangle survives
    assert rounds <= 4                     # simultaneous peel, not 1-by-1


def test_k_core_fixpoint_idempotent(spark):
    # already a 2-core: square 1-2-3-4 -> nothing peels, 1 round
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long")
    out, rounds = k_core(edges, k=2, max_rounds=10, return_rounds=True)
    assert rounds == 1 and out.count() == 4
