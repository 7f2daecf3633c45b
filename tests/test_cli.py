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
