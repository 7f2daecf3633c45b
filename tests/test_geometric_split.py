"""Geometric split path (F15-F18, A9): blades and ST_Split semantics on the
point-array model."""

import numpy as np
import pytest

from osm_pg_etl_spark.operators.spatial import (
    _pair_intersection_points,
    _split_polyline,
    geometric_split,
    way_blades,
)


def poly(*pts):
    return (np.array([p[0] for p in pts], dtype=float),
            np.array([p[1] for p in pts], dtype=float))


def test_intersection_point_proper_crossing():
    a, b = poly((0, 0), (2, 2)), poly((0, 2), (2, 0))
    assert _pair_intersection_points(*a, *b) == [(1.0, 1.0)]


def test_intersection_point_touch():
    a, b = poly((0, 0), (2, 0)), poly((1, 0), (1, 3))
    assert _pair_intersection_points(*a, *b) == [(1.0, 0.0)]


def test_intersection_points_multiple():
    # zigzag crosses the horizontal twice
    a = poly((0, 0), (4, 0))
    b = poly((0.5, -1), (1.5, 1), (2.5, -1))
    got = _pair_intersection_points(*a, *b)
    assert got == [(1.0, 0.0), (2.0, 0.0)]


def test_split_polyline_interior():
    parts = _split_polyline(np.array([0.0, 2.0]), np.array([0.0, 0.0]),
                            [(1.0, 0.0)])
    assert parts == [[(0.0, 0.0), (1.0, 0.0)], [(1.0, 0.0), (2.0, 0.0)]]


def test_split_polyline_endpoint_cut_is_noop():
    parts = _split_polyline(np.array([0.0, 2.0]), np.array([0.0, 0.0]),
                            [(0.0, 0.0), (2.0, 0.0)])
    assert parts == [[(0.0, 0.0), (2.0, 0.0)]]


def test_split_polyline_cut_at_existing_vertex():
    parts = _split_polyline(np.array([0.0, 1.0, 2.0]), np.array([0.0, 1.0, 0.0]),
                            [(1.0, 1.0)])
    assert parts == [[(0.0, 0.0), (1.0, 1.0)], [(1.0, 1.0), (2.0, 0.0)]]


def test_split_polyline_two_cuts_one_segment():
    parts = _split_polyline(np.array([0.0, 4.0]), np.array([0.0, 0.0]),
                            [(3.0, 0.0), (1.0, 0.0)])
    assert parts == [[(0.0, 0.0), (1.0, 0.0)],
                     [(1.0, 0.0), (3.0, 0.0)],
                     [(3.0, 0.0), (4.0, 0.0)]]


def test_split_polyline_point_off_line_ignored():
    parts = _split_polyline(np.array([0.0, 2.0]), np.array([0.0, 0.0]),
                            [(1.0, 0.5)])
    assert parts == [[(0.0, 0.0), (2.0, 0.0)]]


WAYS = [
    (1, [(0.0, 0.0), (2.0, 0.0)]),     # crossed by 2 at (1,0); touched by 3 at (0,0)
    (2, [(1.0, -1.0), (1.0, 1.0)]),
    (3, [(0.0, 1.0), (0.0, -1.0)]),    # passes through 1's start point
    (4, [(9.0, 9.0), (9.5, 9.5)]),     # isolated
]


@pytest.fixture(scope="module")
def ways(spark):
    return spark.createDataFrame(
        WAYS, "id long, linestring array<struct<lon:double,lat:double>>")


def test_way_blades(ways):
    got = {r["id"]: [(p["lon"], p["lat"]) for p in r["blade"]]
           for r in way_blades(ways, cell_deg=1.0).collect()}
    assert got == {
        1: [(0.0, 0.0), (1.0, 0.0)],
        2: [(1.0, 0.0)],
        3: [(0.0, 0.0)],
    }


def test_geometric_split(ways):
    rows = geometric_split(ways, cell_deg=1.0).collect()
    parts = {}
    for r in rows:
        parts.setdefault(r["id"], []).append(
            (r["part_index"], [(p["lon"], p["lat"]) for p in r["geom"]]))
    for v in parts.values():
        v.sort()
    # way 1: blade (0,0) is its start (no cut) + (1,0) interior -> 2 parts
    assert [p for _, p in parts[1]] == [
        [(0.0, 0.0), (1.0, 0.0)], [(1.0, 0.0), (2.0, 0.0)]]
    # way 2: cut at (1,0) interior -> 2 parts
    assert [p for _, p in parts[2]] == [
        [(1.0, -1.0), (1.0, 0.0)], [(1.0, 0.0), (1.0, 1.0)]]
    # way 3: (0,0) is mid-segment -> 2 parts
    assert [p for _, p in parts[3]] == [
        [(0.0, 1.0), (0.0, 0.0)], [(0.0, 0.0), (0.0, -1.0)]]
    # way 4: untouched, passes through whole
    assert [p for _, p in parts[4]] == [[(9.0, 9.0), (9.5, 9.5)]]
