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


def _pair_intersection_points(ax, ay, bx, by) -> list[tuple[float, float]]:
    """All intersection points of two polylines (F16: ``ST_Intersection`` +
    ``ST_Dump`` on the point-array model, ``osm-road-graphs-fix.sql:96``).
    Proper crossings yield the computed crossing point; touches yield the
    touching endpoint. Collinear-overlap contributes its shared endpoints
    (PostGIS would return a line segment there; the blade model only uses
    points, see module docstring)."""
    pts: list[tuple[float, float]] = []
    if len(ax) < 2 or len(bx) < 2:
        return pts

    def cross(ox, oy, x1, y1, x2, y2):
        return (x1 - ox) * (y2 - oy) - (y1 - oy) * (x2 - ox)

    def on_seg(sx1, sy1, sx2, sy2, px, py):
        return (min(sx1, sx2) <= px <= max(sx1, sx2)
                and min(sy1, sy2) <= py <= max(sy1, sy2))

    for i in range(len(ax) - 1):
        p1x, p1y, p2x, p2y = ax[i], ay[i], ax[i + 1], ay[i + 1]
        for j in range(len(bx) - 1):
            q1x, q1y, q2x, q2y = bx[j], by[j], bx[j + 1], by[j + 1]
            d1 = cross(q1x, q1y, q2x, q2y, p1x, p1y)
            d2 = cross(q1x, q1y, q2x, q2y, p2x, p2y)
            d3 = cross(p1x, p1y, p2x, p2y, q1x, q1y)
            d4 = cross(p1x, p1y, p2x, p2y, q2x, q2y)
            if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)) \
                    and 0 not in (d1, d2, d3, d4):
                t = d1 / (d1 - d2)
                pts.append((p1x + t * (p2x - p1x), p1y + t * (p2y - p1y)))
                continue
            if d1 == 0 and on_seg(q1x, q1y, q2x, q2y, p1x, p1y):
                pts.append((p1x, p1y))
            if d2 == 0 and on_seg(q1x, q1y, q2x, q2y, p2x, p2y):
                pts.append((p2x, p2y))
            if d3 == 0 and on_seg(p1x, p1y, p2x, p2y, q1x, q1y):
                pts.append((q1x, q1y))
            if d4 == 0 and on_seg(p1x, p1y, p2x, p2y, q2x, q2y):
                pts.append((q2x, q2y))
    # +0.0 folds IEEE -0.0 into +0.0 so point identity matches SQL DISTINCT
    return sorted({(x + 0.0, y + 0.0) for x, y in pts})


_PT_ARRAY = "array<struct<lon:double,lat:double>>"

_pair_points_udf = None


def pair_intersection_points(*cols):
    global _pair_points_udf
    if _pair_points_udf is None:
        def fn(ax, ay, bx, by):
            return pd.Series([
                [{"lon": x, "lat": y} for x, y in _pair_intersection_points(
                    np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64),
                    np.asarray(c, dtype=np.float64), np.asarray(d, dtype=np.float64))]
                for a, b, c, d in zip(ax, ay, bx, by)])
        _pair_points_udf = pandas_udf(fn, _PT_ARRAY)
    return _pair_points_udf(*cols)


def _split_polyline(xs, ys, cut_pts, eps=1e-9):
    """Cut a polyline at every cut point that lies on it (F15: ``ST_Split``
    + ``ST_Dump``). Returns the list of parts, each a list of (x, y)."""
    cuts = []  # (segment index, parameter t along segment)
    for px, py in cut_pts:
        for i in range(len(xs) - 1):
            dx, dy = xs[i + 1] - xs[i], ys[i + 1] - ys[i]
            seg_len2 = dx * dx + dy * dy
            if seg_len2 == 0:
                continue
            t = ((px - xs[i]) * dx + (py - ys[i]) * dy) / seg_len2
            if -eps <= t <= 1 + eps:
                t = min(max(t, 0.0), 1.0)
                ox, oy = xs[i] + t * dx, ys[i] + t * dy
                if abs(ox - px) <= eps and abs(oy - py) <= eps:
                    cuts.append((i, t))
                    break
    # drop cuts at the line's own endpoints; order along the line
    cuts = sorted({(i, t) for i, t in cuts
                   if not (i == 0 and t <= eps)
                   and not (i == len(xs) - 2 and t >= 1 - eps)})
    if not cuts:
        return [list(zip(xs, ys))]
    parts = []
    cur = [(xs[0], ys[0])]
    ci = 0
    for i in range(len(xs) - 1):
        while ci < len(cuts) and cuts[ci][0] == i:
            _, t = cuts[ci]
            px = xs[i] + t * (xs[i + 1] - xs[i])
            py = ys[i] + t * (ys[i + 1] - ys[i])
            if (px, py) != cur[-1]:
                cur.append((px, py))
            if len(cur) > 1:
                parts.append(cur)
            cur = [(px, py)]
            ci += 1
        nxt = (xs[i + 1], ys[i + 1])
        if nxt != cur[-1]:
            cur.append(nxt)
    if len(cur) > 1:
        parts.append(cur)
    return parts


_split_udf = None


def split_at_points(*cols):
    global _split_udf
    if _split_udf is None:
        def fn(xs, ys, cx, cy):
            out = []
            for x, y, px, py in zip(xs, ys, cx, cy):
                parts = _split_polyline(
                    np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64),
                    list(zip(px, py)))
                out.append([[{"lon": a, "lat": b} for a, b in part]
                            for part in parts])
            return pd.Series(out)
        _split_udf = pandas_udf(fn, f"array<{_PT_ARRAY}>")
    return _split_udf(*cols)


def _collinear_overlap(ax, ay, bx, by) -> bool:
    """True if any collinear segment pair shares a positive-length range —
    dim(interior ∩ interior) = 1 in DE-9IM terms (PostGIS 'overlaps' /
    contains family; the reference's Touches-OR-Crosses excludes it)."""
    if len(ax) < 2 or len(bx) < 2:
        return False
    p1x, p1y = ax[:-1, None], ay[:-1, None]
    p2x, p2y = ax[1:, None], ay[1:, None]
    q1x, q1y = bx[None, :-1], by[None, :-1]
    q2x, q2y = bx[None, 1:], by[None, 1:]

    def cross(ox, oy, x1, y1, x2, y2):
        return (x1 - ox) * (y2 - oy) - (y1 - oy) * (x2 - ox)

    d1 = cross(q1x, q1y, q2x, q2y, p1x, p1y)
    d2 = cross(q1x, q1y, q2x, q2y, p2x, p2y)
    coll = (d1 == 0) & (d2 == 0)
    ovx = (np.maximum(np.minimum(p1x, p2x), np.minimum(q1x, q2x))
           < np.minimum(np.maximum(p1x, p2x), np.maximum(q1x, q2x)))
    ovy = (np.maximum(np.minimum(p1y, p2y), np.minimum(q1y, q2y))
           < np.minimum(np.maximum(p1y, p2y), np.maximum(q1y, q2y)))
    return bool(np.any(coll & (ovx | ovy)))


def _pair_relation(ax, ay, bx, by) -> str | None:
    """DE-9IM line/line classification over the point-array model —
    the exact predicate split of ``osm-road-graphs-fix.sql:100-101``:

    - ``'crosses'``: some intersection point interior to BOTH lines
      (``ST_Crosses``: dim(int∩int) = 0)
    - ``'touches'``: intersects, but only at line boundaries
      (``ST_Touches``: int∩int = ∅)
    - ``'overlap'``: collinear positive-length shared range (excluded by
      the reference's filter, reported so callers can see it)
    - ``None``: disjoint

    Line boundary = first/last vertex (closed rings fall back to treating
    that shared vertex as boundary — consistent in both engines, deviation
    from the OGC empty-boundary rule documented here)."""
    if _collinear_overlap(ax, ay, bx, by):
        return "overlap"
    pts = _pair_intersection_points(ax, ay, bx, by)
    if not pts:
        return None
    bound_a = {(ax[0] + 0.0, ay[0] + 0.0), (ax[-1] + 0.0, ay[-1] + 0.0)}
    bound_b = {(bx[0] + 0.0, by[0] + 0.0), (bx[-1] + 0.0, by[-1] + 0.0)}
    for p in pts:
        if p not in bound_a and p not in bound_b:
            return "crosses"
    return "touches"


_pair_relation_udf = None


def pair_relation(*cols):
    global _pair_relation_udf
    if _pair_relation_udf is None:
        def fn(ax, ay, bx, by):
            return pd.Series([
                _pair_relation(
                    np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64),
                    np.asarray(c, dtype=np.float64), np.asarray(d, dtype=np.float64))
                for a, b, c, d in zip(ax, ay, bx, by)])
        _pair_relation_udf = pandas_udf(fn, "string")
    return _pair_relation_udf(*cols)


def classified_way_pairs(ways: DataFrame, id_col: str = "id",
                         line_col: str = "linestring",
                         cell_deg: float = 0.01) -> DataFrame:
    """:func:`intersecting_way_pairs` plus the exact DE-9IM relation —
    (id_a, id_b, relation ∈ crosses|touches|overlap). Filtering to
    ``relation IN ('crosses','touches')`` reproduces the reference's
    ``ST_Touches(a,b) OR ST_Crosses(a,b)`` predicate-exactly."""
    pairs = _candidate_pair_geoms(ways, id_col, line_col, cell_deg)
    return (pairs.withColumn("relation",
                             pair_relation("ax", "ay", "bx", "by"))
            .filter(F.col("relation").isNotNull())
            .select("id_a", "id_b", "relation"))


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


def _candidate_pair_geoms(ways: DataFrame, id_col: str, line_col: str,
                          cell_deg: float) -> DataFrame:
    """Blocked candidate pairs with both geometries attached (shared head of
    the pair-predicate and intersection-point paths)."""
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
    return cand.join(ga, "id_a").join(gb, "id_b")


def way_blades(ways: DataFrame, id_col: str = "id",
               line_col: str = "linestring",
               cell_deg: float = 0.01) -> DataFrame:
    """Per-way 'blade' multipoint (A9/F16: ``ST_Union(ST_Intersection)``
    per way pair, ``osm-road-graphs-fix.sql:81-104``): the distinct points
    where a way meets any other way. Returns (id, blade) with blade an
    array<struct<lon,lat>> — the point-model multipoint."""
    pairs = (_candidate_pair_geoms(ways, id_col, line_col, cell_deg)
             .withColumn("_pts", pair_intersection_points("ax", "ay", "bx", "by"))
             .filter(F.size("_pts") > 0))
    per_way = (pairs.select(F.col("id_a").alias("id"), "_pts")
               .unionByName(pairs.select(F.col("id_b").alias("id"), "_pts")))
    return (per_way.select("id", F.explode("_pts").alias("pt"))
            .groupBy("id")
            .agg(F.array_sort(F.collect_set("pt")).alias("blade")))


def geometric_split(ways: DataFrame, id_col: str = "id",
                    line_col: str = "linestring",
                    cell_deg: float = 0.01,
                    min_blade_points: int = 0) -> DataFrame:
    """The reference's 'Approach 1' geometric split
    (``osm-road-graphs-fix.sql:89-123``): cut every way's linestring at its
    blade points (``ST_Split`` + ``ST_Dump``, F15) — one output row per
    part, ways without blades pass through whole. ``min_blade_points``
    mirrors the ``ST_NumGeometries > n`` blade-size filter (F18,
    ``osm-road-graphs-fix.sql:105``).

    Unlike the reference — which runs the O(n²) pairwise intersection this
    path was abandoned over — blades come from the grid-blocked join, so
    the geometric path scales the same way the topological one does."""
    blades = way_blades(ways, id_col, line_col, cell_deg)
    if min_blade_points > 0:
        blades = blades.filter(F.size("blade") >= min_blade_points)
    joined = (ways.join(blades, ways[id_col] == blades["id"], "left")
              .select(ways[id_col].alias("_id"), F.col(line_col).alias("_line"),
                      F.coalesce("blade", F.array().cast(
                          "array<struct<lon:double,lat:double>>")).alias("_blade")))
    parts = joined.select(
        "_id",
        F.posexplode(split_at_points(
            F.transform("_line", lambda p: p["lon"]),
            F.transform("_line", lambda p: p["lat"]),
            F.transform("_blade", lambda p: p["lon"]),
            F.transform("_blade", lambda p: p["lat"]))).alias("part_index", "geom"))
    return parts.select(F.col("_id").alias(id_col), "part_index", "geom")


def nearest_neighbor_join(points: DataFrame, targets: DataFrame,
                          cell_deg: float = 0.05,
                          id_col: str = "id", tid_col: str = "target_id"
                          ) -> DataFrame:
    """Grid-blocked nearest-neighbour assignment: for every point the
    closest target (haversine) among the 3×3 grid cells around it, ties
    broken by the smallest target id — the "snap POI to nearest network
    node" step of any map-matching/geocoding pipeline.

    Scale shape: candidates come from an equi-join on (cell_x, cell_y) —
    the points side is exploded into its 9 neighbouring cells (9× the
    SMALL side), the target side is keyed by its own cell only — so the
    pairwise distance work is confined per cell, never all-pairs. Points
    with no target inside the 3×3 neighbourhood are dropped (they are
    farther than ``cell_deg`` away from every target; widen the cell for
    a larger search radius). Both inputs need (lon, lat) columns.

    The per-point argmin is ``min_by`` over (distance, id): distances are
    identical IEEE doubles for identical coordinate pairs, so the result
    is deterministic even on symmetric lattices where distances tie
    exactly.
    """
    from ..functions.geo import haversine_km

    cells = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                      for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    pcx = F.floor(F.col("lon") / cell_deg).cast("int")
    pcy = F.floor(F.col("lat") / cell_deg).cast("int")
    pts = (points.select(F.col(id_col).alias("_pid"),
                         F.col("lon").alias("_plon"),
                         F.col("lat").alias("_plat"),
                         pcx.alias("_cx0"), pcy.alias("_cy0"))
           .withColumn("_o", F.explode(cells))
           .select("_pid", "_plon", "_plat",
                   (F.col("_cx0") + F.col("_o.dx")).alias("cx"),
                   (F.col("_cy0") + F.col("_o.dy")).alias("cy")))
    tg = targets.select(F.col(tid_col).alias("_tid"),
                        F.col("lon").alias("_tlon"),
                        F.col("lat").alias("_tlat"),
                        pcx.alias("cx"), pcy.alias("cy"))
    cand = pts.join(tg, ["cx", "cy"])
    dist = haversine_km(F.col("_plon"), F.col("_plat"),
                        F.col("_tlon"), F.col("_tlat"))
    return (cand.select("_pid", "_tid", dist.alias("_d"))
            .groupBy("_pid")
            .agg(F.min_by(F.struct(F.col("_tid"), F.col("_d")),
                          F.struct(F.col("_d"), F.col("_tid"))).alias("_b"))
            .select(F.col("_pid").alias(id_col),
                    F.col("_b._tid").alias("nearest_id"),
                    F.round(F.col("_b._d"), 6).alias("dist_km")))
