"""operators/rollup.py: re-aggregated ROLLUP/CUBE must equal Spark's
native Expand-based rollup()/cube() row for row — including GROUPING()
markers, data NULLs in key columns, and the empty-input grand total."""

import pytest
from pyspark.sql import functions as F

from osm_pg_etl_spark.operators.rollup import (
    cube_agg, grouping_sets_agg, rollup_agg)

def MEASURES():
    # built as a function: Column construction needs a live SparkContext
    return {
        "n": (F.count(F.lit(1)), "count"),
        "s": (F.sum(F.col("v").cast("decimal(28,6)")), "sum"),
        "mx": (F.max("v"), "max"),
    }


def _native(df, mode):
    g = df.rollup("a", "b") if mode == "rollup" else df.cube("a", "b")
    return g.agg(F.grouping("a").cast("int").alias("g_a"),
                 F.grouping("b").cast("int").alias("g_b"),
                 F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("v").cast("decimal(28,6)")).alias("s"),
                 F.max("v").alias("mx"))


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.fixture(scope="module")
def facts(spark):
    rows = [("x", "p", 1.5), ("x", "q", 2.0), ("y", "p", 0.25),
            ("x", "p", 4.0), (None, "q", 8.0), ("y", None, 1.0),
            (None, None, 3.0)]
    return spark.createDataFrame(rows, "a string, b string, v double")


def test_rollup_matches_native(facts):
    ours = rollup_agg(facts, ["a", "b"], MEASURES())
    assert _canon(ours) == _canon(_native(facts, "rollup"))


def test_cube_matches_native(facts):
    ours = cube_agg(facts, ["a", "b"], MEASURES())
    assert _canon(ours) == _canon(_native(facts, "cube"))


def test_data_nulls_distinguished_from_subtotals(facts):
    """A data NULL in a key column keeps g_<key>=0; only subtotal rows
    carry g_<key>=1 — the exact GROUPING() contract."""
    ours = rollup_agg(facts, ["a", "b"], MEASURES())
    leaf_null = ours.filter((F.col("a").isNull()) & (F.col("b") == "q")
                            & (F.col("g_a") == 0)).collect()
    assert len(leaf_null) == 1 and leaf_null[0]["n"] == 1
    subtotal = ours.filter((F.col("g_a") == 0) & (F.col("g_b") == 1)
                           & F.col("a").isNull()).collect()
    assert len(subtotal) == 1 and subtotal[0]["n"] == 2  # the two a=NULL rows


def test_empty_input_grand_total(spark):
    """SQL: GROUPING SETS containing () over zero rows still emits the
    grand-total row, with COUNT 0 and SUM NULL."""
    empty = spark.createDataFrame([], "a string, b string, v double")
    out = rollup_agg(empty, ["a", "b"], MEASURES()).collect()
    assert len(out) == 1
    row = out[0]
    assert (row["g_a"], row["g_b"], row["n"], row["s"]) == (1, 1, 0, None)


def test_non_subset_grouping_set_rejected(facts):
    with pytest.raises(ValueError):
        grouping_sets_agg(facts, ["a", "b"], MEASURES(), [("a", "c")])


def test_int_keys_keep_dtype(spark):
    """Subtotal NULL literals are cast to the key's real dtype, so the
    unionByName stays schema-stable for non-string keys."""
    df = spark.createDataFrame([(1, 2, 1.0), (1, 3, 2.0)],
                               "a int, b int, v double")
    out = cube_agg(df, ["a", "b"], MEASURES())
    dt = dict(out.dtypes)
    assert dt["a"] == "int" and dt["b"] == "int"
    assert _canon(out) == _canon(_native(df, "cube"))


def test_fixed_point_presum_exactness(spark):
    """fixed_point_presum must reproduce COUNT(*)/decimal-exact SUM for
    fixed-point doubles (including binary-unrepresentable ones like 0.1
    and negatives), skip NULLs like SUM, and survive values scattered
    across partitions."""
    from decimal import Decimal

    from osm_pg_etl_spark.operators.rollup import fixed_point_presum

    rows = [("x", 0.1), ("x", 0.2), ("x", None), ("y", -1.7),
            ("y", 50.000001), ("x", 0.3)] * 7
    df = spark.createDataFrame(rows, "k string, v double").repartition(5)
    pre = fixed_point_presum(df, ["k"], "v")
    out = {r["k"]: (r["_n"], r["_q"]) for r in
           pre.groupBy("k").agg(F.sum("_n").alias("_n"),
                                F.sum("_q").alias("_q")).collect()}
    assert out["x"] == (28, Decimal("4.200000"))       # 7*(0.1+0.2+0.3)
    assert out["y"] == (14, Decimal("338.100007"))     # 7*48.300001
    # empty input: no rows at all (the grand-total NULL/0 behavior is
    # rollup_agg's job, exercised above)
    empty = spark.createDataFrame([], "k string, v double")
    assert fixed_point_presum(empty, ["k"], "v").count() == 0
