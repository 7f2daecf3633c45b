"""pgsnapshot reader (sources.pgsnapshot) + hstore bridging
(functions.hstore).

The hstore tokenizer and the bigint[] literal parser are pure and always
tested; the live leg round-trips the derived world Spark → PostgreSQL
(hstore_literal through the COPY sink) → Spark (read_pgsnapshot) and
must reproduce every tag map and node array exactly — the migration
path a reference user with an existing pgsnapshot database takes.
"""

import os

import pytest

from osm_pg_etl_spark.functions.hstore import _parse_one
from osm_pg_etl_spark.sources.pg_copy import _psql, pg_available

DSN = os.environ.get("OSM_PG_TEST_DSN", "")
live = pytest.mark.skipif(
    not (DSN and pg_available(DSN)),
    reason="no live PostgreSQL (set OSM_PG_TEST_DSN)")


# ------------------------------------------------------------- pure pieces

def test_parse_hstore_canonical_output():
    assert _parse_one('"a"=>"1", "b"=>"2"') == {"a": "1", "b": "2"}
    assert _parse_one('"k"=>NULL') == {"k": None}
    assert _parse_one('"k"=>""') == {"k": ""}          # empty ≠ NULL
    assert _parse_one("") == {}
    assert _parse_one(None) is None


def test_parse_hstore_escapes():
    # key with a quote, value with a backslash, literal NULL as a string
    assert _parse_one('"a\\"b"=>"c\\\\d"') == {'a"b': "c\\d"}
    assert _parse_one('"k"=>"NULL"') == {"k": "NULL"}  # quoted ⇒ string
    assert _parse_one('"=>"=>"=>"') == {"=>": "=>"}


def test_parse_hstore_rejects_malformed():
    with pytest.raises(ValueError, match="unterminated"):
        _parse_one('"a"=>"b')
    with pytest.raises(ValueError, match="=>"):
        _parse_one('"a" "b"')


def test_parse_bigint_array_literals(spark):
    from osm_pg_etl_spark.sources.pgsnapshot import parse_bigint_array

    df = spark.createDataFrame(
        [("{1,2,3}",), ("{}",), ("{42}",)], "s string")
    got = [r[0] for r in df.select(parse_bigint_array("s")).collect()]
    assert got == [[1, 2, 3], [], [42]]


# --------------------------------------------------------------- live leg

@live
def test_hstore_roundtrip_through_real_server(spark):
    """hstore_literal → ::hstore → ::text output → parse_hstore is the
    identity on adversarial maps (quotes, backslashes, =>, commas, empty
    strings, NULL values), through a REAL server's input parser and
    output formatter."""
    from pyspark.sql import functions as F

    from osm_pg_etl_spark.functions.hstore import (
        hstore_literal, parse_hstore)
    from osm_pg_etl_spark.sources.pg_copy import copy_read, copy_write

    maps = [
        (1, {"plain": "v", "empty": ""}),
        (2, {'quo"te': 'back\\slash', "=>": "a,b"}),
        (3, {"nullval": None, "NULL": "NULL"}),
        (4, {}),
    ]
    df = spark.createDataFrame(maps, "id long, tags map<string,string>")
    copy_write(df.select("id", hstore_literal("tags").alias("tags_h")),
               DSN, "hstore_rt_staging", mode="overwrite")
    _psql(DSN, "CREATE EXTENSION IF NOT EXISTS hstore")
    _psql(DSN, "DROP TABLE IF EXISTS hstore_rt")
    _psql(DSN, "CREATE TABLE hstore_rt AS SELECT id, tags_h::hstore AS "
               "tags FROM hstore_rt_staging")
    back = copy_read(spark, DSN, "hstore_rt", "id long, tags_h string",
                     select="id, tags::text AS tags_h") \
        .select("id", parse_hstore("tags_h").alias("tags"))
    got = {r["id"]: (dict(r["tags"]) if r["tags"] is not None else None)
           for r in back.collect()}
    assert got == dict(maps)


@live
def test_read_pgsnapshot_migration_roundtrip(spark):
    """Full migration-path round-trip at sf0.001: the derived world goes
    Spark → pgsnapshot-shaped PostgreSQL tables → read_pgsnapshot →
    engine frames, and tags/nodes/members survive exactly. way_nodes is
    synthesized server-side from ways.nodes (unnest WITH ORDINALITY) the
    way osmosis would have written it."""
    from pyspark.sql import functions as F

    from osm_pg_etl_spark.functions.hstore import hstore_literal
    from osm_pg_etl_spark.plans.common import t
    from osm_pg_etl_spark.plans.osm_derived import (
        derive_osm, derive_relations)
    from osm_pg_etl_spark.sources.pg_copy import copy_write
    from osm_pg_etl_spark.sources.pgsnapshot import read_pgsnapshot

    sf = "/root/testdata/sf0.001"
    d = derive_osm(spark, sf)
    rels, members = derive_relations(t(spark, sf, "customer"),
                                     t(spark, sf, "orders"))
    _psql(DSN, "CREATE EXTENSION IF NOT EXISTS hstore")

    copy_write(d["ways"].select(
        "id", hstore_literal("tags").alias("tags_h"),
        F.concat(F.lit("{"), F.array_join(F.transform(
            "nodes", lambda x: x.cast("string")), ",",
            null_replacement="NULL"),
            F.lit("}")).alias("nodes_s")),
        DSN, "snap_ways_staging", mode="overwrite")
    copy_write(d["nodes"].select(
        "id", hstore_literal("tags").alias("tags_h")),
        DSN, "snap_nodes_staging", mode="overwrite")
    copy_write(rels.select("id", hstore_literal("tags").alias("tags_h")),
               DSN, "snap_rels_staging", mode="overwrite")
    copy_write(members.select("relation_id", "member_id", "member_type",
                              "member_role", "sequence_id"),
               DSN, "relation_members_src", mode="overwrite")
    for sql in (
            "DROP TABLE IF EXISTS ways CASCADE",
            "CREATE TABLE ways AS SELECT id, tags_h::hstore AS tags, "
            "nodes_s::bigint[] AS nodes FROM snap_ways_staging",
            "DROP TABLE IF EXISTS nodes CASCADE",
            "CREATE TABLE nodes AS SELECT id, tags_h::hstore AS tags "
            "FROM snap_nodes_staging",
            "DROP TABLE IF EXISTS relations CASCADE",
            "CREATE TABLE relations AS SELECT id, tags_h::hstore AS tags "
            "FROM snap_rels_staging",
            "DROP TABLE IF EXISTS way_nodes CASCADE",
            "CREATE TABLE way_nodes AS SELECT id AS way_id, n AS node_id, "
            "CAST(ord - 1 AS int) AS sequence_id FROM ways, "
            "unnest(nodes) WITH ORDINALITY AS u(n, ord)",
            "DROP TABLE IF EXISTS relation_members CASCADE",
            "ALTER TABLE relation_members_src RENAME TO relation_members"):
        _psql(DSN, sql)

    got = read_pgsnapshot(spark, DSN, num_partitions=4, with_geom=False)

    def tagmaps(df, id_col="id"):
        return {r[id_col]: dict(r["tags"]) for r in df.collect()}

    assert tagmaps(got["ways"]) == tagmaps(d["ways"])
    assert tagmaps(got["nodes"]) == tagmaps(d["nodes"])
    assert tagmaps(got["relations"]) == tagmaps(rels)
    assert {r["id"]: list(r["nodes"]) for r in got["ways"].collect()} == \
        {r["id"]: list(r["nodes"]) for r in d["ways"].collect()}
    want_wn = sorted((r["id"], n, i) for r in d["ways"].collect()
                     for i, n in enumerate(r["nodes"]))
    got_wn = sorted((r["way_id"], r["node_id"], r["sequence_id"])
                    for r in got["way_nodes"].collect())
    assert got_wn == want_wn
    want_m = sorted(tuple(r) for r in members.select(
        "relation_id", "member_id", "member_type", "member_role",
        "sequence_id").collect())
    got_m = sorted(tuple(r) for r in got["relation_members"].collect())
    assert got_m == want_m
    # parallel slices actually happened
    assert got["ways"].rdd.getNumPartitions() == 4
