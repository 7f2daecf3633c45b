"""Distributed spatial join — SURVEY §2.3 J8, §2.8 F16-F17.

The reference's geometric path self-joins every highway way against every
other with ``a.id != b.id AND (ST_Touches(a, b) OR ST_Crosses(a, b))``
(``osm-road-graphs-fix.sql:96-104``) and flags it "Does not work with large
maps" (``:91``) — an O(n²) pairwise test with only a GiST index to prune.

The Spark-native replacement is the classic two-phase blocked join:

1. **Block**: explode each linestring's covering grid cells
   (:func:`..functions.geo.segment_grid_cells` — segment-bbox cells, a
   guaranteed superset, so blocking introduces no false negatives) and
   equi-join on the cell key. The shuffle is bounded by cell occupancy,
   not by n².
2. **Verify**: exact segment-segment intersection (orientation tests +
   collinear overlap handling) on the deduplicated candidate pairs, via an
   Arrow-batched pandas UDF over numpy — vectorized across all segment
   pairs of a candidate.

Semantics note: the predicate implemented is ``ST_Intersects`` (any shared
point, including collinear overlap). The reference's ``Touches OR Crosses``
excludes only the overlap case, which for its junction-detection purpose is
a degenerate input (duplicate/overlapping road geometry); documented rather
than replicated.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.geo import segment_grid_cells


def _segments_intersect(ax: np.ndarray, ay: np.ndarray,
                        bx: np.ndarray, by: np.ndarray) -> bool:
    """True if any segment of polyline a intersects any segment of b.
    Vectorized over the full segment-pair cross product."""
    if len(ax) < 2 or len(bx) < 2:
        return False
    # a-segments as rows, b-segments as cols
    p1x, p1y = ax[:-1, None], ay[:-1, None]
    p2x, p2y = ax[1:, None], ay[1:, None]
    q1x, q1y = bx[None, :-1], by[None, :-1]
    q2x, q2y = bx[None, 1:], by[None, 1:]

    def cross(ox, oy, x1, y1, x2, y2):
        return (x1 - ox) * (y2 - oy) - (y1 - oy) * (x2 - ox)

    d1 = cross(q1x, q1y, q2x, q2y, p1x, p1y)
    d2 = cross(q1x, q1y, q2x, q2y, p2x, p2y)
    d3 = cross(p1x, p1y, p2x, p2y, q1x, q1y)
    d4 = cross(p1x, p1y, p2x, p2y, q2x, q2y)

    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0)) \
        & (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)

    def on_seg(sx1, sy1, sx2, sy2, px, py):
        return (np.minimum(sx1, sx2) <= px) & (px <= np.maximum(sx1, sx2)) \
            & (np.minimum(sy1, sy2) <= py) & (py <= np.maximum(sy1, sy2))

    touch = ((d1 == 0) & on_seg(q1x, q1y, q2x, q2y, p1x, p1y)) \
        | ((d2 == 0) & on_seg(q1x, q1y, q2x, q2y, p2x, p2y)) \
        | ((d3 == 0) & on_seg(p1x, p1y, p2x, p2y, q1x, q1y)) \
        | ((d4 == 0) & on_seg(p1x, p1y, p2x, p2y, q2x, q2y))

    return bool(np.any(proper | touch))


def _polylines_intersect_fn(ax: pd.Series, ay: pd.Series,
                            bx: pd.Series, by: pd.Series) -> pd.Series:
    return pd.Series([
        _segments_intersect(np.asarray(a, dtype=np.float64),
                            np.asarray(b, dtype=np.float64),
                            np.asarray(c, dtype=np.float64),
                            np.asarray(d, dtype=np.float64))
        for a, b, c, d in zip(ax, ay, bx, by)])


_polylines_intersect_udf = None


def polylines_intersect(*cols):
    """Arrow-batched exact verifier (lazily registered: pandas_udf needs an
    active SparkSession, which module import must not require)."""
    global _polylines_intersect_udf
    if _polylines_intersect_udf is None:
        _polylines_intersect_udf = pandas_udf(_polylines_intersect_fn, "boolean")
    return _polylines_intersect_udf(*cols)


def intersecting_way_pairs(ways: DataFrame, id_col: str = "id",
                           line_col: str = "linestring",
                           cell_deg: float = 0.01) -> DataFrame:
    """All distinct way pairs (id_a < id_b) whose linestrings intersect —
    the scalable form of ``osm-road-graphs-fix.sql:96-104``.

    The cell join carries only (id, cell); geometries are joined back per
    deduplicated candidate pair before exact verification, so the exploded
    shuffle stays narrow and the quadratic blow-up is confined to single
    grid cells (bounded by cell size, split further by AQE skew handling).
    """
    cells = ways.select(
        F.col(id_col).alias("_id"),
        F.explode(segment_grid_cells(line_col, cell_deg)).alias("cell"))
    a = cells.select(F.col("_id").alias("id_a"), "cell")
    b = cells.select(F.col("_id").alias("id_b"), "cell")
    cand = (a.join(b, "cell")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())

    geom = ways.select(
        F.col(id_col).alias("_gid"),
        F.transform(line_col, lambda p: p["lon"]).alias("_xs"),
        F.transform(line_col, lambda p: p["lat"]).alias("_ys"))
    ga = geom.select(F.col("_gid").alias("id_a"),
                     F.col("_xs").alias("ax"), F.col("_ys").alias("ay"))
    gb = geom.select(F.col("_gid").alias("id_b"),
                     F.col("_xs").alias("bx"), F.col("_ys").alias("by"))
    return (cand.join(ga, "id_a").join(gb, "id_b")
            .filter(polylines_intersect("ax", "ay", "bx", "by"))
            .select("id_a", "id_b"))
