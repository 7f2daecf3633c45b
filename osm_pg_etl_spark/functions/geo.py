"""Geometry without PostGIS — SURVEY §2.8 F10-F19.

Model: a point is ``struct<lon:double, lat:double>``; a linestring is
``array<struct<lon,lat>>`` (SRID 4326 throughout). Every function below is a
pure Column expression over built-ins, so geometric pipelines stay inside
whole-stage codegen and scale linearly with partitions — the property the
reference loses when it reaches for the O(n²) spatial join
(``osm-road-graphs-fix.sql:91``: "Does not work with large maps").

Length semantics: the reference is internally inconsistent — planar meters in
SRID 3347 at ``osm-road-graphs.sql:11`` vs geodesic km at ``:156``. Geodesic
(haversine) kilometers is the default everywhere per SURVEY §2.8 F10;
:func:`linestring_length_planar_m` provides the reference's Lambert
(EPSG:3347) projected-meters path for bit-level parity with a reference run.
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


class LCCParams:
    """Lambert conformal conic (2SP, ellipsoidal) projection constants.
    The per-datum spherical-trig work stays per-row; everything that
    depends only on the CRS (n, F, ρ0) is precomputed here in Python so
    the Column expression is a handful of trig calls."""

    def __init__(self, lat0: float, lon0: float, lat1: float, lat2: float,
                 x0: float, y0: float,
                 a: float = 6378137.0, inv_f: float = 298.257222101):
        import math
        self.lat0, self.lon0 = lat0, lon0
        self.x0, self.y0, self.a = x0, y0, a
        f = 1.0 / inv_f
        self.e = math.sqrt(f * (2.0 - f))
        e = self.e

        def m(phi):
            return math.cos(phi) / math.sqrt(1 - (e * math.sin(phi)) ** 2)

        def t(phi):
            return (math.tan(math.pi / 4 - phi / 2)
                    / ((1 - e * math.sin(phi))
                       / (1 + e * math.sin(phi))) ** (e / 2))

        p0, p1, p2 = map(math.radians, (lat0, lat1, lat2))
        self.n = ((math.log(m(p1)) - math.log(m(p2)))
                  / (math.log(t(p1)) - math.log(t(p2))))
        self.F = m(p1) / (self.n * t(p1) ** self.n)
        self.rho0 = a * self.F * t(p0) ** self.n


# NAD83 / Statistics Canada Lambert — the planar CRS of the reference's
# ST_Length(ST_Transform(way, 3347)) (osm-road-graphs.sql:11)
EPSG_3347 = LCCParams(lat0=63.390675, lon0=-91.866666666666667,
                      lat1=49.0, lat2=77.0, x0=6200000.0, y0=3000000.0)


def lambert_xy(lon: Column | str, lat: Column | str,
               params: LCCParams = EPSG_3347) -> Column:
    """Forward Lambert conformal conic projection of a 4326 lon/lat pair →
    ``struct<x:double, y:double>`` in projected meters — the Column-math
    equivalent of ``ST_Transform(geom, 3347)`` (``osm-road-graphs.sql:11``).
    Snyder (1987) eq. 15-1..15-9, ellipsoidal case."""
    import math
    lon, lat = _col(lon).cast("double"), _col(lat).cast("double")
    phi = F.radians(lat)
    esin = F.lit(params.e) * F.sin(phi)
    t = (F.tan(F.lit(math.pi / 4) - phi / 2)
         / F.pow((F.lit(1.0) - esin) / (F.lit(1.0) + esin),
                 F.lit(params.e / 2)))
    rho = F.lit(params.a * params.F) * F.pow(t, F.lit(params.n))
    theta = F.lit(params.n) * (F.radians(lon) - F.lit(math.radians(params.lon0)))
    return F.struct(
        (F.lit(params.x0) + rho * F.sin(theta)).alias("x"),
        (F.lit(params.y0 + params.rho0) - rho * F.cos(theta)).alias("y"))


def linestring_length_planar_m(line: Column | str,
                               params: LCCParams = EPSG_3347) -> Column:
    """``ST_Length(ST_Transform(geom, 3347))`` — planar projected meters
    (``osm-road-graphs.sql:11``), closing the reference's Lambert-meters
    length path; geodesic km (:func:`linestring_length_km`) stays the
    default per SURVEY §8. Same zip_with/aggregate shape as the geodesic
    version — pure whole-stage-codegen Column math."""
    line = _col(line)
    xy = F.transform(line, lambda p: lambert_xy(p["lon"], p["lat"], params))
    pairs = F.zip_with(
        F.slice(xy, 1, F.greatest(F.size(xy) - 1, F.lit(0))),
        F.slice(xy, 2, F.greatest(F.size(xy) - 1, F.lit(0))),
        lambda p, q: F.sqrt((p["x"] - q["x"]) ** 2 + (p["y"] - q["y"]) ** 2),
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
