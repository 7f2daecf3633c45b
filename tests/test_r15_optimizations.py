"""Focused equivalence tests for round-15 optimization internals.

Each test pins an optimization that REPLACED one computation with a
cheaper equivalent: the equivalence itself is what must hold, so a
future edit that breaks it fails here rather than at the next oracle
sweep.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_lit_double_array_bit_identical(spark):
    """_lit_double_array (one SQL-parsed expression) must produce the
    exact doubles of the per-element-literal path, including values
    whose decimal form is non-trivial to round-trip."""
    from osm_pg_etl_spark.operators.similarity import _lit_double_array

    vals = [0.1, -0.0, 1e-320, 2.0 ** 1023, 123456789.123456789,
            -1.7976931348623157e308, 5e-324, 0.30000000000000004]
    row = (spark.range(1)
           .select(_lit_double_array(vals).alias("a"),
                   F.array(*[F.lit(float(x)) for x in vals]).alias("b"))
           .collect()[0])
    assert all(
        (math.copysign(1.0, x) == math.copysign(1.0, y) and x == y)
        for x, y in zip(row["a"], row["b"]))


def test_lit_double_array_nonfinite_fallback(spark):
    """Non-finite values cannot ride SQL text — the helper must fall
    back to per-element literals and still deliver them."""
    from osm_pg_etl_spark.operators.similarity import _lit_double_array

    row = (spark.range(1)
           .select(_lit_double_array([1.0, float("nan"), float("inf")])
                   .alias("a")).collect()[0])
    assert row["a"][0] == 1.0
    assert math.isnan(row["a"][1])
    assert math.isinf(row["a"][2])


def test_car_way_ids_equals_car_network_edge_ids(spark):
    """derive_car_way_ids (plain-column tag cascade, no way assembly)
    must produce exactly the distinct edge-id set of the full
    car_network operator — the substitution osm_relation_members rides."""
    from osm_pg_etl_spark.operators.network import car_network
    from osm_pg_etl_spark.plans.osm_derived import (derive_car_way_ids,
                                                    derive_osm)

    fast = {r[0] for r in derive_car_way_ids(spark, SF).collect()}
    full = {r[0] for r in (car_network(derive_osm(spark, SF)["ways"])
                           .select("edge_id").distinct().collect())}
    assert fast == full
    assert fast, "empty car network at sf0.001 would make the test vacuous"
