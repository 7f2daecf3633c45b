"""SQL catalog surface: the derived world must be queryable via spark.sql
under the reference's table names (osm-road-graphs.sql CTAS chain)."""

import pytest


@pytest.fixture(scope="module")
def views(spark):
    from osm_pg_etl_spark.catalog import register_osm_views

    return register_osm_views(spark, "/root/testdata/sf0.001")


def test_all_reference_tables_registered(spark, views):
    expected = {"nodes", "ways", "way_nodes", "car_network",
                "ways_shared_nodes", "ways_merge_limits", "nodes_to_merge",
                "car_network_merged", "car_graph_directed", "pois"}
    assert expected <= set(views)
    registered = {t.name for t in spark.catalog.listTables()}
    assert expected <= registered


def test_sql_over_views_matches_dataframes(spark, views):
    n_sql = spark.sql("SELECT COUNT(*) AS n FROM car_graph_directed").first()["n"]
    assert n_sql == views["car_graph_directed"].count() > 0
    # a reference-style ad-hoc join: speed-limit histogram of merged edges
    hist = spark.sql("""
        SELECT speed_limit, COUNT(*) AS n
        FROM car_network_merged GROUP BY speed_limit ORDER BY n DESC
    """).collect()
    assert sum(r["n"] for r in hist) == views["car_network_merged"].count()


def test_topology_invariant_via_sql(spark, views):
    # every merged segment's node range must sit inside its parent way
    bad = spark.sql("""
        SELECT COUNT(*) AS n
        FROM car_network_merged m JOIN ways w ON m.edge_id = w.id
        WHERE size(m.nodes) > size(w.nodes)
    """).first()["n"]
    assert bad == 0


def test_schema_info_and_users(spark):
    from osm_pg_etl_spark.catalog import schema_info, users_table

    si = schema_info(spark).collect()
    assert [(r["version"]) for r in si] == [6]

    nodes = spark.createDataFrame(
        [(1, 10, "alice"), (2, 10, "alice"), (3, 11, None), (4, None, None)],
        "id long, user_id int, user_name string")
    ways = spark.createDataFrame([(5, 12)], "id long, user_id int")
    got = {r["id"]: r["name"] for r in users_table(nodes, ways).collect()}
    assert got == {10: "alice", 11: None, 12: None}
