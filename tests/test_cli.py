"""End-to-end CLI workflow (python -m osm_pg_etl_spark): the reference's
osmosis -> SQL scripts -> igraph chain as subcommands, driven on a
generated spec-valid PBF."""

from __future__ import annotations

import datetime as dt

from osm_pg_etl_spark.__main__ import main
from osm_pg_etl_spark.sources import pbf

TS = dt.datetime(2024, 1, 1)


def _grid_pbf(path: str, n: int = 5) -> None:
    def nid(r: int, c: int) -> int:
        return r * 100 + c + 1

    nodes = [{"id": nid(r, c), "lat": 45.0 + r * 0.01,
              "lon": -73.0 + c * 0.01, "version": 1, "user_id": 1,
              "changeset_id": 1, "tstamp": TS, "tags": {}}
             for r in range(n) for c in range(n)]
    ways = []
    wid = 1000
    for r in range(n):
        wid += 1
        ways.append({"id": wid, "nodes": [nid(r, c) for c in range(n)],
                     "version": 1, "user_id": 1, "changeset_id": 1,
                     "tstamp": TS,
                     "tags": {"highway": "residential", "maxspeed": "50"}})
    for c in range(n):
        wid += 1
        ways.append({"id": wid, "nodes": [nid(r, c) for r in range(n)],
                     "version": 1, "user_id": 1, "changeset_id": 1,
                     "tstamp": TS, "tags": {"highway": "residential"}})
    pbf.write_pbf(path, nodes=nodes, ways=ways)


def test_cli_workflow_end_to_end(spark, tmp_path):
    src = str(tmp_path / "grid.osm.pbf")
    _grid_pbf(src)
    osm, net, out = (str(tmp_path / d) for d in ("osm", "net", "out"))

    main(["ingest", src, osm])
    main(["network", osm, net, "--mode", "car", "--minimal"])
    main(["analyze", net, out, "--algo",
          "components,communities,louvain,sssp"])
    main(["export", net, str(tmp_path / "edges")])

    merged = spark.read.parquet(f"{net}/merged.parquet")
    # 5x5 grid: each of 10 ways splits at 3 interior intersections -> 4
    # segments each
    assert merged.count() == 40
    comp = spark.read.parquet(f"{out}/components.parquet")
    assert comp.select("component").distinct().count() == 1  # one grid
    lv = spark.read.parquet(f"{out}/louvain.parquet")
    assert lv.count() == comp.count()  # every node labelled
    sssp = spark.read.parquet(f"{out}/sssp.parquet")
    assert sssp.count() == comp.count()  # grid fully reachable
    csv = spark.read.option("header", True).csv(str(tmp_path / "edges"))
    directed = spark.read.parquet(f"{net}/directed.parquet")
    assert csv.count() == directed.count() > 0

    # --delta switches sssp to radius stepping; distances must be
    # identical (shortcuts carry real path lengths)
    out2 = str(tmp_path / "out2")
    main(["analyze", net, out2, "--algo", "sssp", "--delta", "0.05"])
    base = sorted(map(tuple, sssp.collect()))
    rad = sorted(map(tuple,
                     spark.read.parquet(f"{out2}/sssp.parquet").collect()))
    assert rad == base


def test_cli_analyze_sssp_empty_network(spark, tmp_path):
    """analyze --algo sssp on an empty directed network must exit with a
    clear message, not an opaque TypeError from int(None)."""
    import pytest

    net = str(tmp_path / "net")
    empty = spark.createDataFrame(
        [], "start_node long, end_node long, length double")
    empty.write.parquet(f"{net}/directed.parquet")
    with pytest.raises(SystemExit, match="empty"):
        main(["analyze", net, str(tmp_path / "out"), "--algo", "sssp"])


def test_cli_pg_round_trip(spark, tmp_path):
    """pgload + pgread against a live server: derive tables from a PBF,
    bulk-load ways into PostgreSQL (map -> hstore, array -> bigint[]),
    synthesize the remaining pgsnapshot tables, migrate back with
    pgread --no-geom, and check the tags/nodes survive."""
    import os

    import pytest

    from osm_pg_etl_spark.sources.pg_copy import _psql, pg_available

    dsn = os.environ.get("OSM_PG_TEST_DSN", "")
    if not (dsn and pg_available(dsn)):
        pytest.skip("no live PostgreSQL (set OSM_PG_TEST_DSN)")

    src = str(tmp_path / "grid.osm.pbf")
    _grid_pbf(src)
    osm_dir = str(tmp_path / "osm")
    main(["ingest", src, osm_dir])

    main(["pgload", f"{osm_dir}/ways.parquet", "--dsn", dsn,
          "--table", "cli_ways"])
    assert _psql(dsn, 'SELECT count(*) FROM "cli_ways"').strip() == "10"
    assert _psql(dsn, "SELECT count(*) FROM \"cli_ways\" WHERE "
                      "tags -> 'highway' = 'residential'").strip() == "10"

    # complete the pgsnapshot surface server-side, then migrate back
    for sql in (
            "DROP TABLE IF EXISTS ways CASCADE",
            'ALTER TABLE "cli_ways" RENAME TO ways',
            "DROP TABLE IF EXISTS nodes CASCADE",
            "CREATE TABLE nodes AS SELECT DISTINCT n AS id, "
            "''::hstore AS tags FROM ways, unnest(nodes) AS u(n)",
            "DROP TABLE IF EXISTS way_nodes CASCADE",
            "CREATE TABLE way_nodes AS SELECT id AS way_id, n AS node_id, "
            "CAST(ord - 1 AS int) AS sequence_id FROM ways, "
            "unnest(nodes) WITH ORDINALITY AS u(n, ord)",
            "DROP TABLE IF EXISTS relations CASCADE",
            "CREATE TABLE relations (id bigint, tags hstore)",
            "DROP TABLE IF EXISTS relation_members CASCADE",
            "CREATE TABLE relation_members (relation_id bigint, "
            "member_id bigint, member_type text, member_role text, "
            "sequence_id int)"):
        _psql(dsn, sql)
    back_dir = str(tmp_path / "back")
    main(["pgread", back_dir, "--dsn", dsn, "--partitions", "2",
          "--no-geom"])
    ways = spark.read.parquet(f"{back_dir}/ways.parquet")
    assert ways.count() == 10
    got = {r["id"]: (dict(r["tags"]), list(r["nodes"]))
           for r in ways.collect()}
    want = {r["id"]: (dict(r["tags"]), list(r["nodes"]))
            for r in spark.read.parquet(f"{osm_dir}/ways.parquet")
            .select("id", "tags", "nodes").collect()}
    assert got == want
    # 10 ways x 5 nodes each
    assert spark.read.parquet(f"{back_dir}/way_nodes.parquet").count() == 50
