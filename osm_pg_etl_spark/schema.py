"""Explicit StructTypes for the OSM relational model.

Mirrors the pgsnapshot DDL (``etl/pgsnapshot_schema_0.6.sql:18-80`` in the
reference) with the type mapping from SURVEY.md §1.2:

- ``hstore``                      → ``map<string,string>``
- ``bigint[]`` (ways.nodes)       → ``array<bigint>``
- ``geometry(Point,4326)``        → ``struct<lon:double, lat:double>`` columns
                                     flattened to ``lon``/``lat``
- ``geometry(Linestring,4326)``   → ``array<struct<lon:double, lat:double>>``

The point-struct geometry model keeps every geometric computation inside
JVM whole-stage codegen (no PostGIS, no Python UDF).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TAGS = MapType(StringType(), StringType())
POINT = StructType([StructField("lon", DoubleType()), StructField("lat", DoubleType())])
LINESTRING = ArrayType(POINT)

_ENTITY_COMMON = [
    StructField("id", LongType(), False),
    StructField("version", IntegerType(), True),
    StructField("user_id", IntegerType(), True),
    StructField("tstamp", TimestampType(), True),
    StructField("changeset_id", LongType(), True),
    StructField("tags", TAGS, True),
]

# nodes: etl/pgsnapshot_schema_0.6.sql:31-41 (geom POINT → lon/lat doubles)
NODES = StructType(_ENTITY_COMMON + [
    StructField("lon", DoubleType(), True),
    StructField("lat", DoubleType(), True),
])

# ways: etl/pgsnapshot_schema_0.6.sql:44-52 + _linestring.sql:2
WAYS = StructType(_ENTITY_COMMON + [
    StructField("nodes", ArrayType(LongType()), True),
    StructField("linestring", LINESTRING, True),
])

# way_nodes: etl/pgsnapshot_schema_0.6.sql:55-59
WAY_NODES = StructType([
    StructField("way_id", LongType(), False),
    StructField("node_id", LongType(), False),
    StructField("sequence_id", IntegerType(), False),
])

# relations: etl/pgsnapshot_schema_0.6.sql:62-71
RELATIONS = StructType(_ENTITY_COMMON)

# relation_members: etl/pgsnapshot_schema_0.6.sql:74-80
RELATION_MEMBERS = StructType([
    StructField("relation_id", LongType(), False),
    StructField("member_id", LongType(), False),
    StructField("member_type", StringType(), False),  # character(1): N/W/R
    StructField("member_role", StringType(), True),
    StructField("sequence_id", IntegerType(), False),
])

# users: etl/pgsnapshot_schema_0.6.sql:24-28. The DDL declares name NOT
# NULL (Osmosis always writes one); name is nullable here because a PBF
# written without user metadata yields uids with no name string.
USERS = StructType([
    StructField("id", IntegerType(), False),
    StructField("name", StringType(), True),
])

# schema_info: etl/pgsnapshot_schema_0.6.sql:18-21 (version row inserted at
# :84: INSERT INTO schema_info (version) VALUES (6))
SCHEMA_INFO = StructType([
    StructField("version", IntegerType(), False),
])
PGSNAPSHOT_SCHEMA_VERSION = 6

# actions change feed: etl/pgsnapshot_schema_0.6_action.sql:8-12
ACTIONS = StructType([
    StructField("data_type", StringType(), False),  # character(1): N/W/R
    StructField("action", StringType(), False),     # character(1): C/M/D
    StructField("id", LongType(), False),
])

OSM_SCHEMAS: dict[str, StructType] = {
    "nodes": NODES,
    "ways": WAYS,
    "way_nodes": WAY_NODES,
    "relations": RELATIONS,
    "relation_members": RELATION_MEMBERS,
    "users": USERS,
    "schema_info": SCHEMA_INFO,
    "actions": ACTIONS,
}

# Driver-generated synthetic tables (TESTDATA.md); schemas inferred from
# parquet, listed here for reference by name only.
TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)
