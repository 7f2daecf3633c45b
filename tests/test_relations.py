"""relation_route_summary over a hand-built relations world."""

from __future__ import annotations


def test_relation_route_summary(spark):
    from osm_pg_etl_spark.operators.relations import relation_route_summary

    rels = spark.createDataFrame(
        [(1, {"type": "route", "route": "road", "ref": "R1"}),
         (2, {"type": "multipolygon"}),          # filtered out
         (3, {"type": "route", "route": "bus"})],  # no members
        "id long, tags map<string,string>")
    members = spark.createDataFrame(
        [(1, 10, "W", "forward", 0),
         (1, 11, "W", "", 1),
         (1, 12, "W", "backward", 2),
         (1, 99, "N", "stop", 3),
         (2, 10, "W", "", 0)],
        "relation_id long, member_id long, member_type string, "
        "member_role string, sequence_id int")
    # way 12 is not in the network; node member 99 collides with no edge
    network = spark.createDataFrame(
        [(10,), (11,), (99,)], "edge_id long")

    got = {r["relation_id"]: r
           for r in relation_route_summary(rels, members, network).collect()}
    assert set(got) == {1, 3}
    r1 = got[1]
    assert (r1["route"], r1["ref"]) == ("road", "R1")
    assert r1["n_members"] == 4
    assert r1["n_way_members"] == 3
    assert r1["n_net_ways"] == 2          # 10, 11 — N member 99 not counted
    assert r1["n_forward"] == 1
    assert r1["way_list"] == "10,11,12"   # ordered by sequence_id, W only
    r3 = got[3]
    assert (r3["n_members"], r3["way_list"], r3["ref"]) == (0, "", None)
