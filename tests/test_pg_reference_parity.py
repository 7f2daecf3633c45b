"""Run the REFERENCE'S OWN SQL on live PostgreSQL and match it against
the Spark operators.

The DuckDB oracles prove engine-vs-engine parity on translated SQL; this
suite is the stronger claim: the geometry-free prefix of
``osm-road-graphs.sql`` (car_network include-filter, exclusion DELETE,
maxspeed summaries, median aggregate, the median-imputation UPDATE) and
``general-functions.sql`` (get_ints_from_text, the median aggregate) are
executed **verbatim from the reference checkout** on PostgreSQL —
the engine they were written for — over the same derived ways table, and
the results must equal ``operators.network.car_network`` /
``impute_speed_limit`` / ``highway_maxspeed_values`` and
``operators.stats.median_by_group`` row for row.

No reference code is copied into this repo: the scripts are read from
``REF_DIR`` at test runtime and the suite skips when the checkout or a
live server (``OSM_PG_TEST_DSN``) is absent. PostGIS is not required —
``ST_Length``/``ST_Transform`` are stubbed as float8 identities and the
``linestring`` column is NULL, which only blanks the ``length`` column
(geodesic length has its own gates: osm_planar_length, haversine).

Data flows Spark→PostgreSQL through :mod:`sources.pg_copy` (hstore and
bigint[] literals staged as text), so this doubles as an end-to-end
COPY-sink test with real nested-ish payloads.
"""

import os
from pathlib import Path

import pytest

from osm_pg_etl_spark.sources.pg_copy import _psql, copy_write, pg_available

DSN = os.environ.get("OSM_PG_TEST_DSN", "")
REF_DIR = Path(os.environ.get("OSM_REF_DIR", "/root/reference"))
SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not (DSN and pg_available(DSN) and
         (REF_DIR / "osm-road-graphs.sql").exists() and
         os.path.isdir(SF_DIR)),
    reason="needs live PostgreSQL (OSM_PG_TEST_DSN), the reference "
           "checkout (OSM_REF_DIR), and the sf0.001 testdata")


def _hstore_literal(tags_col):
    """Build a PostgreSQL hstore input literal from a MapType column:
    ``"k"=>"v","k2"=>NULL`` with backslash/quote escaping."""
    from pyspark.sql import functions as F

    def esc(c):
        return F.replace(F.replace(c, F.lit("\\"), F.lit("\\\\")),
                         F.lit('"'), F.lit('\\"'))

    entry = lambda e: F.concat(  # noqa: E731
        F.lit('"'), esc(e["key"]), F.lit('"=>'),
        F.when(e["value"].isNull(), F.lit("NULL"))
        .otherwise(F.concat(F.lit('"'), esc(e["value"]), F.lit('"'))))
    return F.array_join(
        F.transform(F.map_entries(tags_col), entry), ",")


def _load_ways_into_pg(spark):
    from pyspark.sql import functions as F

    from osm_pg_etl_spark.plans.osm_derived import derive_osm

    ways = derive_osm(spark, SF_DIR)["ways"]
    staged = ways.select(
        "id",
        _hstore_literal(F.col("tags")).alias("tags_h"),
        F.concat(F.lit("{"),
                 F.array_join(F.transform("nodes",
                                          lambda x: x.cast("string")), ","),
                 F.lit("}")).alias("nodes_s"))
    copy_write(staged, DSN, "ways_staging", mode="overwrite")
    _psql(DSN, "DROP TABLE IF EXISTS ways CASCADE")
    _psql(DSN, "CREATE TABLE ways AS SELECT id, tags_h::hstore AS tags, "
               "nodes_s::bigint[] AS nodes, NULL::float8 AS linestring "
               "FROM ways_staging")
    return ways


def _reference_sql_chunks() -> tuple[str, str]:
    """The geometry-free prefix of osm-road-graphs.sql, split at the
    median-UPDATE so the pre-impute table can be snapshotted: chunk 1 =
    CREATE car_network + exclusion DELETE + maxspeed_values summary,
    chunk 2 = median table + imputation UPDATE. Markers are the file's
    own section comments; a loud failure here means the reference layout
    changed, not that parity broke."""
    text = (REF_DIR / "osm-road-graphs.sql").read_text()
    m_median = text.find("-- Create a table to summarise median")
    m_nodes = text.find("-- Create network nodes table")
    assert 0 < m_median < m_nodes, "reference script layout changed"
    return text[:m_median], text[m_median:m_nodes]


@pytest.fixture(scope="module")
def pg_reference(spark):
    """Load ways, install the reference's functions, run its script
    prefix; yields nothing — tests read the produced tables."""
    ways = _load_ways_into_pg(spark)
    # clean slate for re-runs (the reference's CREATE SCHEMA/AGGREGATE
    # are not idempotent)
    _psql(DSN, "DROP SCHEMA IF EXISTS graphs CASCADE")
    _psql(DSN, "DROP SCHEMA IF EXISTS tags_summary CASCADE")
    _psql(DSN, "CREATE SCHEMA tags_summary")
    _psql(DSN, "CREATE EXTENSION IF NOT EXISTS hstore")
    _psql(DSN, "DROP AGGREGATE IF EXISTS median(anyelement)")
    for sig in ("_final_median(anyarray)", "get_ints_from_text(text)",
                "array_reverse(anyarray)",
                "weighted_median(regclass,varchar,varchar)",
                "weighted_median_by_group(regclass,varchar,varchar,varchar)",
                "st_transform(float8,int)", "st_length(float8)"):
        _psql(DSN, f"DROP FUNCTION IF EXISTS {sig}")
    # PostGIS stand-ins: identity on the NULL linestring column — only
    # the (unchecked) length column flows through them
    _psql(DSN, "CREATE FUNCTION ST_Transform(float8, int) RETURNS float8 "
               "AS 'SELECT $1' LANGUAGE SQL IMMUTABLE")
    _psql(DSN, "CREATE FUNCTION ST_Length(float8) RETURNS float8 "
               "AS 'SELECT $1' LANGUAGE SQL IMMUTABLE")
    # the reference was written for PostgreSQL <= 13, where array_append
    # was (anyarray, anyelement); PG 14 changed it to anycompatible*,
    # which CREATE AGGREGATE's exact-signature lookup no longer matches.
    # A thin polymorphic shim restores the old signature.
    _psql(DSN, "DROP FUNCTION IF EXISTS "
               "public.array_append(anyarray, anyelement)")
    _psql(DSN, "CREATE FUNCTION public.array_append(anyarray, anyelement) "
               "RETURNS anyarray AS 'SELECT pg_catalog.array_append($1, $2)' "
               "LANGUAGE SQL IMMUTABLE")
    # the reference's helper functions, verbatim
    _psql(DSN, (REF_DIR / "general-functions.sql").read_text())
    chunk1, chunk2 = _reference_sql_chunks()
    _psql(DSN, chunk1)
    _psql(DSN, "CREATE TABLE graphs.car_network_pre AS "
               "SELECT * FROM graphs.car_network")
    _psql(DSN, chunk2)
    return ways


def _pg_rows(sql: str) -> list[tuple]:
    """Query rows as tuples of strings via COPY TO STDOUT (tab-separated,
    unambiguous; NULLs are '' via the explicit COALESCE the callers
    use)."""
    out = _psql(DSN, f"COPY ({sql}) TO STDOUT")
    return [tuple(line.split("\t")) for line in out.splitlines()]


def _edge_rows(df) -> list[tuple]:
    return sorted(
        (str(r["edge_id"]), str(r["start_node"]), str(r["end_node"]),
         r["highway"] or "", r["oneway"] or "",
         "" if r["speed_limit"] is None else str(r["speed_limit"]))
        for r in df.collect())


_EDGE_SQL = ("SELECT edge_id, start_node, end_node, "
             "COALESCE(highway,''), COALESCE(oneway,''), "
             "COALESCE(speed_limit::text,'') FROM {} ORDER BY edge_id")


def test_car_network_filter_matches_reference_engine(spark, pg_reference):
    """Include-filter + exclusion DELETE + first-int speed parsing: the
    pre-impute graphs.car_network from the reference's own SQL on
    PostgreSQL equals operators.network.car_network."""
    from osm_pg_etl_spark.operators.network import car_network

    got = _edge_rows(car_network(pg_reference))
    want = sorted(_pg_rows(_EDGE_SQL.format("graphs.car_network_pre")))
    assert len(got) > 100  # non-degenerate corpus
    assert got == want


def test_median_imputation_matches_reference_engine(spark, pg_reference):
    """The reference's median aggregate + UPDATE…FROM, run on PostgreSQL,
    equals impute_speed_limit — including the float8→int4 assignment
    rounding."""
    from osm_pg_etl_spark.operators.network import (
        car_network, impute_speed_limit)

    got = _edge_rows(impute_speed_limit(car_network(pg_reference)))
    want = sorted(_pg_rows(_EDGE_SQL.format("graphs.car_network")))
    assert got == want


def test_maxspeed_values_matches_reference_engine(spark, pg_reference):
    from osm_pg_etl_spark.operators.network import (
        car_network, highway_maxspeed_values)

    got = sorted(
        (r["highway"] or "",
         "" if r["speed_limit"] is None else str(r["speed_limit"]),
         str(r["count"]))
        for r in highway_maxspeed_values(car_network(pg_reference)).collect())
    want = sorted(_pg_rows(
        "SELECT COALESCE(highway,''), COALESCE(speed_limit::text,''), "
        "count FROM tags_summary.highway_maxspeed_values"))
    assert got == want


def test_median_table_matches_reference_engine(spark, pg_reference):
    """The reference's array-append median aggregate vs
    stats.median_by_group, to 6 decimals."""
    from osm_pg_etl_spark.operators.network import car_network
    from osm_pg_etl_spark.operators.stats import median_by_group

    med = median_by_group(car_network(pg_reference),
                          ["highway"], "speed_limit", alias="median")
    got = sorted(
        (r["highway"] or "",
         "" if r["median"] is None else f"{float(r['median']):.6f}")
        for r in med.collect())
    want = sorted(
        (h, "" if m == "" else f"{float(m):.6f}")
        for h, m in _pg_rows(
            "SELECT COALESCE(highway,''), COALESCE(median::text,'') "
            "FROM tags_summary.highway_maxspeed_median"))
    assert got == want
