"""Geometry without PostGIS — SURVEY §2.8 F10-F19.

Model: a point is ``struct<lon:double, lat:double>``; a linestring is
``array<struct<lon,lat>>`` (SRID 4326 throughout). Every function below is a
pure Column expression over built-ins, so geometric pipelines stay inside
whole-stage codegen and scale linearly with partitions — the property the
reference loses when it reaches for the O(n²) spatial join
(``osm-road-graphs-fix.sql:91``: "Does not work with large maps").

Length semantics: the reference is internally inconsistent — planar meters in
SRID 3347 at ``osm-road-graphs.sql:11`` vs geodesic km at ``:156``. We use
geodesic (haversine) kilometers everywhere and document the choice, per
SURVEY §2.8 F10.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def point(lon: Column | str, lat: Column | str) -> Column:
    """Build a point struct from lon/lat columns."""
    return F.struct(_col(lon).cast("double").alias("lon"),
                    _col(lat).cast("double").alias("lat"))


def haversine_km(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle distance in km (replaces ``ST_Length(geography)`` for a
    single segment, ``osm-road-graphs.sql:156``)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (F.sin(dlat / 2) ** 2
         + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) ** 2)
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.least(F.lit(1.0), F.sqrt(a)))


def linestring_length_km(line: Column | str) -> Column:
    """``ST_Length(geom::geography)/1000`` over the point-array model
    (``osm-road-graphs.sql:156``, ``osm-road-graphs-fix.sql:123``): sum of
    haversine distances over consecutive point pairs.

    Implemented as ``zip_with(line, shift(line))`` + ``aggregate`` — fully
    JVM-side; per-way arrays are small (≤2000 nodes per the pgsnapshot
    statistics note, ``etl/pgsnapshot_schema_0.6.sql:157``), so this is
    embarrassingly parallel with no skew risk at any scale.
    """
    line = _col(line)
    pairs = F.zip_with(
        F.slice(line, 1, F.greatest(F.size(line) - 1, F.lit(0))),
        F.slice(line, 2, F.greatest(F.size(line) - 1, F.lit(0))),
        lambda p, q: haversine_km(p["lon"], p["lat"], q["lon"], q["lat"]),
    )
    return F.aggregate(pairs, F.lit(0.0), lambda acc, x: acc + x)


def point_wkt(lon: Column | str, lat: Column | str, precision: int = 7) -> Column:
    """``ST_AsText(geom)`` for points → ``POINT(lon lat)``
    (``osm-road-graphs.sql:59,170``; the ``ST_Transform(,4326)`` there is a
    no-op since data is already 4326)."""
    fmt = f"POINT(%.{precision}f %.{precision}f)"
    return F.format_string(fmt, _col(lon).cast("double"), _col(lat).cast("double"))


def linestring_wkt(line: Column | str, precision: int = 7) -> Column:
    """WKT export for linestrings → ``LINESTRING(x y, x y, ...)``."""
    fmt = f"%.{precision}f %.{precision}f"
    parts = F.transform(_col(line), lambda p: F.format_string(fmt, p["lon"], p["lat"]))
    return F.concat(F.lit("LINESTRING("), F.array_join(parts, ", "), F.lit(")"))


def make_line(points_sorted: Column | str) -> Column:
    """``ST_MakeLine(array_agg(geom ORDER BY seq))`` (``osm-road-graphs.sql:144``)
    is the identity on the array-of-points model — provided for parity."""
    return _col(points_sorted)


def snap_to_grid(lon: Column | str, lat: Column | str, tolerance: float = 0.0001) -> Column:
    """Tolerance grid key for ``pgr_createTopology``-style endpoint snapping
    (``osm-road-graphs-fix.sql:130``, tolerance 0.0001°): round coords to the
    grid and emit a string cell key. Distinct keys then get dense node ids
    via ``dense_rank`` (see operators.graphs.create_topology)."""
    inv = 1.0 / tolerance
    gx = F.round(_col(lon) * inv).cast("long")
    gy = F.round(_col(lat) * inv).cast("long")
    return F.concat_ws(":", gx, gy)


def segment_grid_cells(line: Column | str, cell_deg: float = 0.01) -> Column:
    """Covering grid cells of every *segment's bounding box* — a guaranteed
    superset of the cells the line passes through, so cell-blocking has no
    false negatives even when a segment spans cells none of its endpoints
    fall in. Per segment this is the small integer rectangle
    [floor(min lon/c), floor(max lon/c)] × [floor(min lat/c), floor(max
    lat/c)]; road segments are short relative to any sane cell size, so the
    expansion factor is ~1-4 cells per segment."""
    inv = 1.0 / cell_deg
    line = _col(line)
    n = F.size(line)
    heads = F.slice(line, 1, F.greatest(n - 1, F.lit(0)))
    tails = F.slice(line, 2, F.greatest(n - 1, F.lit(0)))

    def cells_of(p: Column, q: Column) -> Column:
        gx0 = F.floor(F.least(p["lon"], q["lon"]) * inv)
        gx1 = F.floor(F.greatest(p["lon"], q["lon"]) * inv)
        gy0 = F.floor(F.least(p["lat"], q["lat"]) * inv)
        gy1 = F.floor(F.greatest(p["lat"], q["lat"]) * inv)
        return F.flatten(F.transform(
            F.sequence(gx0, gx1),
            lambda gx: F.transform(F.sequence(gy0, gy1),
                                   lambda gy: F.concat_ws(":", gx, gy))))

    return F.array_distinct(F.flatten(F.zip_with(heads, tails, cells_of)))


def grid_cells(line: Column | str, cell_deg: float = 0.01) -> Column:
    """Covering grid cells of a linestring's vertices — the blocking key for
    the distributed spatial join (SURVEY §2.3 J8). Exploding these and
    equi-joining on cell replaces the O(n²) ``ST_Touches/ST_Crosses`` self
    join (``osm-road-graphs-fix.sql:96-104``) with a shuffle-bounded join."""
    inv = 1.0 / cell_deg
    cells = F.transform(
        _col(line),
        lambda p: F.concat_ws(":", F.floor(p["lon"] * inv), F.floor(p["lat"] * inv)),
    )
    return F.array_distinct(cells)
