"""HyperLogLog with engine-exact md5 registers (operators/sketch.py)."""

import pytest
from pyspark.sql import functions as F

from osm_pg_etl_spark.operators.sketch import hll_distinct, hll_registers


def test_hll_accuracy_large(spark):
    df = spark.range(0, 10_000).select(F.col("id").alias("v"))
    est = hll_distinct(df, "v").collect()[0]["hll_estimate"]
    assert abs(est - 10_000) / 10_000 < 0.1   # σ ≈ 1.04/√1024 ≈ 3.3%


def test_hll_small_range_correction(spark):
    df = spark.range(0, 50).select(F.col("id").alias("v"))
    est = hll_distinct(df, "v").collect()[0]["hll_estimate"]
    assert abs(est - 50) <= 2                  # linear counting regime


def test_hll_duplicates_ignored(spark):
    df = spark.range(0, 3000).select((F.col("id") % 100).alias("v"))
    est = hll_distinct(df, "v").collect()[0]["hll_estimate"]
    assert abs(est - 100) <= 5


def test_hll_grouped_and_merge(spark):
    df = spark.range(0, 2000).select(
        (F.col("id") % 2).alias("g"), F.col("id").alias("v"))
    ests = {r["g"]: r["hll_estimate"]
            for r in hll_distinct(df, "v", ["g"]).collect()}
    assert set(ests) == {0, 1}
    assert all(abs(e - 1000) / 1000 < 0.15 for e in ests.values())
    # mergeable-sketch property: shard registers max-merge to the global ones
    half_a = hll_registers(df.filter("v < 1000"), "v")
    half_b = hll_registers(df.filter("v >= 1000"), "v")
    merged = (half_a.unionByName(half_b).groupBy("_reg")
              .agg(F.max("_rank").alias("_rank")))
    whole = hll_registers(df, "v")
    assert sorted(map(tuple, merged.collect())) \
        == sorted(map(tuple, whole.collect()))


def test_hll_p_validation(spark):
    df = spark.range(1).select(F.col("id").alias("v"))
    with pytest.raises(ValueError):
        hll_registers(df, "v", p=2)
