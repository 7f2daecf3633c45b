"""tags_summary catalog — full osm-explore.sql table list in one call."""

from __future__ import annotations

EXPECTED_TABLES = [
    # osm-explore.sql:10-91
    "highway_values", "highway_other_tags", "highway_service",
    "highway_tags_values", "railway_ways_values", "railway_nodes_values",
    "highway_oneway_values",
    # nodes POIs (:96-166)
    "amenity_nodes_values", "shop_nodes_values", "leisure_nodes_values",
    "craft_nodes_values", "sport_nodes_values", "tourism_nodes_values",
    "office_nodes_values",
    # ways POIs (:169-207)
    "amenity_ways_values", "sport_ways_values", "leisure_ways_values",
    "landuse_ways_values",
    # relations POIs (:211-247)
    "amenity_relations_values", "leisure_relations_values",
    "sport_relations_values", "landuse_relations_values",
]


def _world(spark):
    nodes = spark.createDataFrame(
        [(1, {"amenity": "pub", "name": "x"}),
         (2, {"railway": "halt"}),
         (3, {"shop": "bakery", "craft": "brewery"})],
        "id long, tags map<string,string>")
    ways = spark.createDataFrame(
        [(10, {"highway": "service", "service": "alley", "oneway": "yes"}),
         (11, {"highway": "service"}),                 # NULL service group
         (12, {"highway": "residential", "name:en": "a",
               "source": "b", "surface": "dirt"}),
         (13, {"railway": "rail"}),
         (14, {"oneway": "yes"}),                      # no highway
         (15, {"landuse": "forest", "leisure": "park"})],
        "id long, tags map<string,string>")
    rels = spark.createDataFrame(
        [(20, {"sport": "soccer"}), (21, {"amenity": "school"})],
        "id long, tags map<string,string>")
    return nodes, ways, rels


def test_catalog_covers_every_reference_table(spark):
    from osm_pg_etl_spark.operators.tags import tags_summary_catalog

    nodes, ways, rels = _world(spark)
    cat = tags_summary_catalog(nodes, ways, rels)
    assert list(cat) == EXPECTED_TABLES
    # without relations, the relation tables are simply absent
    cat2 = tags_summary_catalog(nodes, ways)
    assert list(cat2) == [t for t in EXPECTED_TABLES
                          if not t.endswith("_relations_values")]


def test_catalog_semantics(spark):
    from osm_pg_etl_spark.operators.tags import tags_summary_catalog

    nodes, ways, rels = _world(spark)
    cat = tags_summary_catalog(nodes, ways, rels)

    hv = {r["highway"]: r["count"] for r in cat["highway_values"].collect()}
    assert hv == {"service": 2, "residential": 1}

    # service summary keeps the NULL group (way 11)
    svc = {r["service"]: r["count"] for r in cat["highway_service"].collect()}
    assert svc == {"alley": 1, None: 1}

    # oneway crosstab requires BOTH keys: way 14 (oneway, no highway) is out
    ow = {(r["highway"], r["oneway"]): r["count"]
          for r in cat["highway_oneway_values"].collect()}
    assert ow == {("service", "yes"): 1}

    # kv explode drops denylisted/substring keys (name:en, source) but
    # keeps surface; restricted to highway ways only
    kv = {(r["tag"], r["value"]) for r in cat["highway_tags_values"].collect()}
    assert ("surface", "dirt") in kv
    assert not any(t in ("name:en", "source") for t, _ in kv)
    assert ("landuse", "forest") not in kv

    # highway_other_tags has NO denylist (reference :21-28)
    keys = {r["tag"] for r in cat["highway_other_tags"].collect()}
    assert {"name:en", "source", "highway"} <= keys

    rel = {r["sport"]: r["count"]
           for r in cat["sport_relations_values"].collect()}
    assert rel == {"soccer": 1}


def test_register_tags_summary_views(spark):
    from osm_pg_etl_spark.catalog import register_tags_summary

    nodes, ways, rels = _world(spark)
    register_tags_summary(spark, nodes, ways, rels)
    for t in EXPECTED_TABLES:
        assert spark.catalog.tableExists(f"tags_summary_{t}")
    got = spark.sql(
        "SELECT count FROM tags_summary_highway_values "
        "WHERE highway = 'service'").collect()
    assert got[0]["count"] == 2
