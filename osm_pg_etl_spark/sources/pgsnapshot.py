"""Read an existing pgsnapshot PostgreSQL database into engine tables —
the MIGRATION PATH for reference users.

The reference workflow starts with osmosis loading a pgsnapshot schema
into PostgreSQL (``osm-pg-etl.md``; ``etl/pgsnapshot_schema_0.6.sql``:
``nodes``/``ways``/``way_nodes``/``relations``/``relation_members`` with
hstore tags, bigint[] node lists, PostGIS point geometry). A user
switching to this engine already has that database; this module pulls it
straight into the engine's native shapes (``map<string,string>`` tags,
``array<long>`` nodes, lon/lat doubles) over the COPY source — no JDBC
jar, no intermediate files, every table read in parallel slices.

Per table: driver asks the server for the primary-key bounds (one
index-only min/max), builds stride predicates, and each Spark task
streams its ``COPY (SELECT … WHERE slice) TO STDOUT``. Type bridging is
server-side where PostgreSQL owns the type (``tags::text``,
``nodes::text``, ``ST_X/ST_Y(geom)``) and Spark-side where the engine
owns it (:func:`..functions.hstore.parse_hstore`, the bigint[] literal
split — a pure Column expression).

``with_geom=False`` skips the PostGIS calls (servers without PostGIS,
or when geometry will be rebuilt from way_nodes × nodes like the derive
pipeline does anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hstore import parse_hstore
from .jdbc import stride_predicates
from .pg_copy import _psql, copy_read


def _id_bounds(dsn: str, table: str, col: str) -> tuple[int, int] | None:
    out = _psql(dsn, f'SELECT min("{col}"), max("{col}") FROM "{table}"')
    lo, _, hi = out.strip().partition("|")
    if not lo or not hi:
        return None  # empty table
    return int(lo), int(hi)


def _preds(dsn: str, table: str, col: str, n: int) -> list[str]:
    bounds = _id_bounds(dsn, table, col)
    if bounds is None:
        return ["FALSE"]  # empty table: one no-op task
    lo, hi = bounds
    return stride_predicates(col, lo, hi + 1, n)


def parse_bigint_array(col: F.Column | str) -> F.Column:
    """``{1,2,3}``/``{}`` text literal → ``array<long>`` — pure Column
    expression (no UDF: integer array literals have no quoting/escaping)."""
    c = F.col(col) if isinstance(col, str) else col
    inner = F.regexp_replace(c, r"^\{|\}$", "")
    return (F.when(inner == "", F.array().cast("array<long>"))
            .otherwise(F.transform(F.split(inner, ","),
                                   lambda x: x.cast("long"))))


def read_pgsnapshot(spark: SparkSession, dsn: str,
                    num_partitions: int = 32,
                    with_geom: bool = True) -> dict[str, DataFrame]:
    """Load the five pgsnapshot entity tables into engine-native frames:
    ``nodes (id, lon, lat, tags)``, ``ways (id, tags, nodes)``,
    ``way_nodes (way_id, node_id, sequence_id)``, ``relations (id,
    tags)``, ``relation_members (relation_id, member_id, member_type,
    member_role, sequence_id)`` — the exact inputs the derive/network
    pipeline consumes, so ``car_network(tables["ways"])`` etc. work
    directly on a reference user's existing database."""
    n = num_partitions

    lon = "ST_X(geom)" if with_geom else "NULL::float8"
    lat = "ST_Y(geom)" if with_geom else "NULL::float8"
    nodes = copy_read(
        spark, dsn, "nodes",
        "id long, lon double, lat double, tags_h string",
        predicates=_preds(dsn, "nodes", "id", n),
        select=f'id, {lon} AS lon, {lat} AS lat, tags::text AS tags_h',
    ).select("id", "lon", "lat", parse_hstore("tags_h").alias("tags"))

    ways = copy_read(
        spark, dsn, "ways",
        "id long, tags_h string, nodes_s string",
        predicates=_preds(dsn, "ways", "id", n),
        select="id, tags::text AS tags_h, nodes::text AS nodes_s",
    ).select("id", parse_hstore("tags_h").alias("tags"),
             parse_bigint_array("nodes_s").alias("nodes"))

    way_nodes = copy_read(
        spark, dsn, "way_nodes",
        "way_id long, node_id long, sequence_id int",
        predicates=_preds(dsn, "way_nodes", "way_id", n))

    relations = copy_read(
        spark, dsn, "relations",
        "id long, tags_h string",
        predicates=_preds(dsn, "relations", "id", n),
        select="id, tags::text AS tags_h",
    ).select("id", parse_hstore("tags_h").alias("tags"))

    relation_members = copy_read(
        spark, dsn, "relation_members",
        "relation_id long, member_id long, member_type string, "
        "member_role string, sequence_id int",
        predicates=_preds(dsn, "relation_members", "relation_id", n))

    return {"nodes": nodes, "ways": ways, "way_nodes": way_nodes,
            "relations": relations, "relation_members": relation_members}
