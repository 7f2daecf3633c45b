"""Relation membership queries — the pgsnapshot ``relations`` /
``relation_members`` surface (``etl/pgsnapshot_schema_0.6.sql:57-80``).

The reference loads both tables (Osmosis, ``etl/osm-load.sh:29``) and
summarizes relation tags in ``osm-explore.sql:209-247``; any real OSM
workload additionally joins members back to ways/nodes (route extraction,
multipolygon assembly). This module provides that join as a first-class
operator over the same schema: ``id/tags`` relations, ``relation_id/
member_id/member_type('N'|'W'|'R')/member_role/sequence_id`` members.

Scale shape: one groupBy on ``relation_id`` (members are naturally
clustered by relation; ordered reassembly is a ``sort_array(collect_list)``
of (sequence, member) structs — the same bounded-by-relation-size pattern
as way assembly), one equi-join against the network edge ids, and one join
back to the (much smaller) relations table. No windows, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def relation_route_summary(relations: DataFrame, members: DataFrame,
                           network: DataFrame,
                           type_value: str = "route") -> DataFrame:
    """Per route relation: member counts, how many member ways survive into
    the routable network, and the ordered member-way list.

    ``relations`` must carry ``(id, tags)``, ``members`` the pgsnapshot
    member columns, ``network`` an edge table with ``edge_id`` = way id
    (e.g. ``car_network`` output). Relations of ``type_value`` with no
    members still appear (counts 0, empty way list) — LEFT JOIN semantics,
    matching the SQL a reference user would write against pgsnapshot.
    """
    routes = (relations
              .where(F.col("tags")["type"] == type_value)
              .select(F.col("id").alias("relation_id"),
                      F.col("tags")["route"].alias("route"),
                      F.col("tags")["ref"].alias("ref")))

    edge_ids = (network.select(F.col("edge_id").alias("member_id"))
                .distinct().withColumn("_cn", F.lit(1)))
    is_way = F.col("member_type") == "W"
    flagged = (members
               .join(edge_ids, "member_id", "left")
               .select("relation_id", "member_id", "member_type",
                       "member_role", "sequence_id",
                       (is_way & F.col("_cn").isNotNull()).alias("_in_net")))

    per_rel = (flagged.groupBy("relation_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum(F.when(is_way, 1).otherwise(0)).alias("n_way_members"),
        F.count_distinct(F.when(F.col("_in_net"), F.col("member_id")))
         .alias("n_net_ways"),
        F.sum(F.when(F.col("member_role") == "forward", 1).otherwise(0))
         .alias("n_forward"),
        F.array_join(F.transform(
            F.filter(
                F.sort_array(F.collect_list(F.struct(
                    F.col("sequence_id").alias("seq"),
                    F.col("member_type").alias("mt"),
                    F.col("member_id").alias("mid")))),
                lambda s: s["mt"] == "W"),
            lambda s: s["mid"].cast("string")), ",").alias("way_list")))

    return (routes.join(per_rel, "relation_id", "left")
            .select("relation_id", "route", "ref",
                    F.coalesce("n_members", F.lit(0)).alias("n_members"),
                    F.coalesce("n_way_members", F.lit(0)).alias("n_way_members"),
                    F.coalesce("n_net_ways", F.lit(0)).alias("n_net_ways"),
                    F.coalesce("n_forward", F.lit(0)).alias("n_forward"),
                    F.coalesce("way_list", F.lit("")).alias("way_list")))
