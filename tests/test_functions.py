"""Scalar function semantics — SURVEY §2.8 F1-F12."""

import math

import pytest
from pyspark.sql import functions as F

from osm_pg_etl_spark.functions.arrays import (
    array_first,
    array_last,
    array_reverse,
    first_int,
    get_ints_from_text,
)
from osm_pg_etl_spark.functions.geo import (
    haversine_km,
    linestring_length_km,
    point_wkt,
    snap_to_grid,
)
from osm_pg_etl_spark.functions.maps import tag_get, tag_has


def _one(df, col):
    return df.select(col.alias("x")).collect()[0]["x"]


def test_get_ints_from_text(spark):
    # general-functions.sql:3-5 — regex split on non-digits, drop empties
    df = spark.range(1)
    assert _one(df, get_ints_from_text(F.lit("50 mph"))) == [50]
    assert _one(df, get_ints_from_text(F.lit("maxspeed=30;40"))) == [30, 40]
    assert _one(df, get_ints_from_text(F.lit("none"))) == []
    assert _one(df, get_ints_from_text(F.lit(None).cast("string"))) is None


def test_first_int(spark):
    df = spark.range(1)
    assert _one(df, first_int(F.lit("50 mph"))) == 50
    assert _one(df, first_int(F.lit("none"))) is None
    assert _one(df, first_int(F.lit(None).cast("string"))) is None


def test_array_ends_and_reverse(spark):
    df = spark.createDataFrame([([1, 2, 3],)], "a array<long>")
    assert _one(df, array_first("a")) == 1
    assert _one(df, array_last("a")) == 3
    assert _one(df, array_reverse("a")) == [3, 2, 1]


def test_tag_ops(spark):
    df = spark.createDataFrame(
        [({"highway": "residential"},), ({},)],
        "tags map<string,string>")
    rows = df.select(tag_get("tags", "highway").alias("v"),
                     tag_has("tags", "highway").alias("h")).collect()
    assert (rows[0]["v"], rows[0]["h"]) == ("residential", True)
    assert (rows[1]["v"], rows[1]["h"]) == (None, False)


def test_haversine_known_distance(spark):
    # 1 degree of longitude at the equator ~ 111.1949 km (R=6371.0088)
    df = spark.range(1)
    got = _one(df, haversine_km(F.lit(0.0), F.lit(0.0), F.lit(1.0), F.lit(0.0)))
    assert got == pytest.approx(6371.0088 * math.pi / 180, rel=1e-9)


def test_linestring_length_sums_segments(spark):
    df = spark.createDataFrame(
        [([(0.0, 0.0), (1.0, 0.0), (1.0, 1.0)],)],
        "line array<struct<lon:double,lat:double>>")
    one_deg = 6371.0088 * math.pi / 180
    got = _one(df, linestring_length_km("line"))
    # second leg is a meridian arc: same length as an equatorial degree
    assert got == pytest.approx(2 * one_deg, rel=1e-6)
    # single point / empty -> 0.0
    df2 = spark.createDataFrame(
        [([(5.0, 5.0)],), ([],)], "line array<struct<lon:double,lat:double>>")
    assert [r["x"] for r in
            df2.select(linestring_length_km("line").alias("x")).collect()] \
        == [0.0, 0.0]


def test_point_wkt(spark):
    df = spark.range(1)
    got = _one(df, point_wkt(F.lit(-8.1), F.lit(42.25)))
    assert got == "POINT(-8.1000000 42.2500000)"


def test_snap_to_grid_groups_nearby_points(spark):
    df = spark.range(1)
    a = _one(df, snap_to_grid(F.lit(1.00004), F.lit(2.00004), 0.0001))
    b = _one(df, snap_to_grid(F.lit(1.00001), F.lit(2.00001), 0.0001))
    c = _one(df, snap_to_grid(F.lit(1.0012), F.lit(2.0), 0.0001))
    assert a == b
    assert a != c


def test_salted_count_sum_equals_direct(spark):
    from osm_pg_etl_spark.functions.skew import salted_count_sum, with_salt
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("hot", i, float(i % 7)) for i in range(500)]
        + [("cold", i, 1.0) for i in range(3)],
        "k string, uid long, v double")
    got = {r["k"]: (r["n_rows"], r["sum_value"]) for r in
           salted_count_sum(df, ["k"], "v", entropy_col="uid",
                            buckets=8).collect()}
    direct = {r["k"]: (r["n"], r["s"]) for r in
              df.groupBy("k").agg(
                  F.count(F.lit(1)).alias("n"),
                  F.round(F.sum("v"), 4).alias("s")).collect()}
    assert got == direct
    # the salt actually spreads the hot key across buckets
    n_buckets = (with_salt(df, "uid", 8).filter(F.col("k") == "hot")
                 .select("_salt").distinct().count())
    assert n_buckets == 8


def test_lambert_false_origin_and_scale(spark):
    from osm_pg_etl_spark.functions.geo import EPSG_3347, lambert_xy

    p = EPSG_3347
    rows = spark.range(1).select(
        lambert_xy(F.lit(p.lon0), F.lit(p.lat0)).alias("o"),
        # two points 0.001 deg apart along each standard parallel
        lambert_xy(F.lit(-91.0), F.lit(49.0)).alias("a1"),
        lambert_xy(F.lit(-90.999), F.lit(49.0)).alias("a2"),
        lambert_xy(F.lit(-91.0), F.lit(77.0)).alias("b1"),
        lambert_xy(F.lit(-90.999), F.lit(77.0)).alias("b2"),
        lambert_xy(F.lit(-91.0), F.lit(63.0)).alias("c1"),
        lambert_xy(F.lit(-90.999), F.lit(63.0)).alias("c2"),
        lambert_xy(F.lit(-91.0), F.lit(40.0)).alias("d1"),
        lambert_xy(F.lit(-90.999), F.lit(40.0)).alias("d2"),
    ).collect()[0]
    # the projection origin maps exactly to the false origin
    assert rows["o"]["x"] == pytest.approx(6200000.0, abs=1e-6)
    assert rows["o"]["y"] == pytest.approx(3000000.0, abs=1e-6)

    def planar(u, v):
        return math.hypot(u["x"] - v["x"], u["y"] - v["y"])

    def parallel_arc(lat_deg, dlon_deg):
        # ellipsoidal parallel arc: a*cos(phi)/sqrt(1-e^2 sin^2 phi) * dλ
        phi = math.radians(lat_deg)
        nu = p.a / math.sqrt(1 - (p.e * math.sin(phi)) ** 2)
        return nu * math.cos(phi) * math.radians(dlon_deg)

    # scale factor is exactly 1 on both standard parallels...
    assert planar(rows["a1"], rows["a2"]) == pytest.approx(
        parallel_arc(49.0, 0.001), rel=1e-6)
    assert planar(rows["b1"], rows["b2"]) == pytest.approx(
        parallel_arc(77.0, 0.001), rel=1e-6)
    # ...below 1 between them, above 1 outside
    assert planar(rows["c1"], rows["c2"]) < parallel_arc(63.0, 0.001)
    assert planar(rows["d1"], rows["d2"]) > parallel_arc(40.0, 0.001)


def test_planar_length_matches_pointwise_projection(spark):
    from osm_pg_etl_spark.functions.geo import (
        EPSG_3347,
        lambert_xy,
        linestring_length_planar_m,
        linestring_length_km,
    )

    pts = [(-73.6, 45.5), (-73.59, 45.51), (-73.58, 45.505)]
    df = spark.createDataFrame(
        [(([{"lon": lo, "lat": la} for lo, la in pts]),)],
        "line array<struct<lon:double,lat:double>>")
    got = df.select(
        linestring_length_planar_m("line").alias("m"),
        linestring_length_km("line").alias("km"),
        F.transform("line", lambda p: lambert_xy(p["lon"], p["lat"]))
        .alias("xy")).collect()[0]
    want = sum(
        math.hypot(got["xy"][i]["x"] - got["xy"][i + 1]["x"],
                   got["xy"][i]["y"] - got["xy"][i + 1]["y"])
        for i in range(len(pts) - 1))
    assert got["m"] == pytest.approx(want, rel=1e-12)
    # Montreal (45.5N) is south of the 49N standard parallel, i.e. outside
    # the parallels: planar meters come out slightly LONG of geodesic
    # (scale factor > 1), within ~2%
    ratio = got["m"] / (got["km"] * 1000.0)
    assert 1.0 < ratio < 1.02
