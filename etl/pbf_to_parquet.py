#!/usr/bin/env python3
"""Convert an OpenStreetMap ``.osm.pbf`` extract into the parquet tables
this engine reads (SURVEY §2.1 S1).

The reference loads PBF with Osmosis into pgsnapshot tables
(``etl/osm-load.sh:29``: ``osmosis --read-pbf ... --write-pgsql``); the
Spark engine starts at parquet files with the same relational model
(:mod:`osm_pg_etl_spark.schema`), so ingest is this one-shot external
conversion — run it once per extract, anywhere pyosmium is installed:

    pip install osmium pyarrow          # both public PyPI packages
    python etl/pbf_to_parquet.py montenegro-latest.osm.pbf out_dir/

Produces ``nodes.parquet``, ``ways.parquet``, ``way_nodes.parquet``,
``relations.parquet``, ``relation_members.parquet`` with the pgsnapshot
column layout (``etl/pgsnapshot_schema_0.6.sql:18-80``): tags as
map<string,string>, ways.nodes as array<bigint>, geometry as lon/lat
doubles (point) / array<struct<lon,lat>> (linestring — assembled from node
locations exactly like pgsnapshot's _linestring.sql trigger).

This script is intentionally standalone: the engine itself has NO runtime
dependency on pyosmium, and the driver's synthetic testdata bypasses it.
Memory note: node locations are cached via osmium's flex sparse index —
fine for country extracts; for planet-scale use osmium-tool first
(``osmium export`` / tag-filter to shrink the extract), then convert.
"""

from __future__ import annotations

import sys

try:
    import osmium  # pyosmium, public PyPI
except ImportError as e:  # pragma: no cover - conversion-host dependency
    raise SystemExit(
        "pyosmium is required for PBF conversion (pip install osmium); "
        "the engine itself reads the parquet this script produces"
    ) from e

import pyarrow as pa
import pyarrow.parquet as pq

_TAGS = pa.map_(pa.string(), pa.string())
_POINT = pa.struct([("lon", pa.float64()), ("lat", pa.float64())])

NODES_SCHEMA = pa.schema([
    ("id", pa.int64()), ("version", pa.int32()), ("user_id", pa.int32()),
    ("tstamp", pa.timestamp("us")), ("changeset_id", pa.int64()),
    ("tags", _TAGS), ("lon", pa.float64()), ("lat", pa.float64()),
])
WAYS_SCHEMA = pa.schema([
    ("id", pa.int64()), ("version", pa.int32()), ("user_id", pa.int32()),
    ("tstamp", pa.timestamp("us")), ("changeset_id", pa.int64()),
    ("tags", _TAGS), ("nodes", pa.list_(pa.int64())),
    ("linestring", pa.list_(_POINT)),
])
WAY_NODES_SCHEMA = pa.schema([
    ("way_id", pa.int64()), ("node_id", pa.int64()),
    ("sequence_id", pa.int32()),
])
RELATIONS_SCHEMA = pa.schema([
    ("id", pa.int64()), ("version", pa.int32()), ("user_id", pa.int32()),
    ("tstamp", pa.timestamp("us")), ("changeset_id", pa.int64()),
    ("tags", _TAGS),
])
RELATION_MEMBERS_SCHEMA = pa.schema([
    ("relation_id", pa.int64()), ("member_id", pa.int64()),
    ("member_type", pa.string()), ("member_role", pa.string()),
    ("sequence_id", pa.int32()),
])

_BATCH_ROWS = 200_000  # rows per parquet row group — many row groups per
                       # file so the Spark scan parallelizes (see spread())


class _BatchedWriter:
    def __init__(self, path: str, schema: pa.Schema):
        self.writer = pq.ParquetWriter(path, schema)
        self.schema = schema
        self.rows: list[dict] = []

    def add(self, row: dict) -> None:
        self.rows.append(row)
        if len(self.rows) >= _BATCH_ROWS:
            self.flush()

    def flush(self) -> None:
        if self.rows:
            self.writer.write_table(
                pa.Table.from_pylist(self.rows, schema=self.schema))
            self.rows = []

    def close(self) -> None:
        self.flush()
        self.writer.close()


def _common(o) -> dict:
    return {
        "id": o.id, "version": o.version, "user_id": o.uid,
        "tstamp": o.timestamp.replace(tzinfo=None) if o.timestamp else None,
        "changeset_id": o.changeset, "tags": dict(o.tags),
    }


class _Handler(osmium.SimpleHandler):
    def __init__(self, out_dir: str):
        super().__init__()
        self.nodes = _BatchedWriter(f"{out_dir}/nodes.parquet", NODES_SCHEMA)
        self.ways = _BatchedWriter(f"{out_dir}/ways.parquet", WAYS_SCHEMA)
        self.way_nodes = _BatchedWriter(
            f"{out_dir}/way_nodes.parquet", WAY_NODES_SCHEMA)
        self.rels = _BatchedWriter(
            f"{out_dir}/relations.parquet", RELATIONS_SCHEMA)
        self.rel_members = _BatchedWriter(
            f"{out_dir}/relation_members.parquet", RELATION_MEMBERS_SCHEMA)

    def node(self, n) -> None:
        self.nodes.add(_common(n)
                       | {"lon": n.location.lon, "lat": n.location.lat})

    def way(self, w) -> None:
        # 'with locations' handler: w.nodes carry cached coordinates, so the
        # linestring is assembled here exactly like pgsnapshot's
        # _linestring.sql trigger does from the nodes table
        pts, ids = [], []
        for wn in w.nodes:
            ids.append(wn.ref)
            pts.append({"lon": wn.location.lon, "lat": wn.location.lat}
                       if wn.location.valid() else None)
        line = None if any(p is None for p in pts) else pts
        self.ways.add(_common(w) | {"nodes": ids, "linestring": line})
        for i, ref in enumerate(ids):
            self.way_nodes.add(
                {"way_id": w.id, "node_id": ref, "sequence_id": i})

    def relation(self, r) -> None:
        self.rels.add(_common(r))
        for i, m in enumerate(r.members):
            self.rel_members.add({
                "relation_id": r.id, "member_id": m.ref,
                "member_type": m.type.upper(), "member_role": m.role,
                "sequence_id": i,
            })

    def close(self) -> None:
        for w in (self.nodes, self.ways, self.way_nodes, self.rels,
                  self.rel_members):
            w.close()


def convert(pbf_path: str, out_dir: str) -> None:
    import os

    os.makedirs(out_dir, exist_ok=True)
    h = _Handler(out_dir)
    # idx='flex_mem' caches node locations for way linestring assembly
    h.apply_file(pbf_path, locations=True, idx="flex_mem")
    h.close()


if __name__ == "__main__":
    if len(sys.argv) != 3:
        raise SystemExit(__doc__.split("\n\n")[1])
    convert(sys.argv[1], sys.argv[2])
