"""JDBC source/sink (sources.jdbc).

The partition predicates every task runs are pure functions, fully tested
here (including executed verbatim on DuckDB). The Spark JVM JDBC leg —
write_jdbc table create + batched partition-parallel writes, read_jdbc
predicate-partitioned reads — runs for real against embedded Derby
(bundled with Spark, so it works in any sandbox). The PostgreSQL-specific
leg additionally needs the org.postgresql jar (scripts/fetch_jdbc_driver.sh
-> vendor/jars/) + the live server from scripts/pg_live_setup.sh; when
both are present conftest enables test_jdbc_roundtrip_live_postgres.
"""

import os

import pytest

from osm_pg_etl_spark.sources.jdbc import hash_predicates, stride_predicates


def test_stride_predicates_cover_all_rows_without_overlap():
    preds = stride_predicates("id", 0, 100, 4)
    assert len(preds) == 4
    # first partition captures NULLs and anything below lower
    assert preds[0] == "id < 25 OR id IS NULL"
    assert preds[1] == "id >= 25 AND id < 50"
    assert preds[2] == "id >= 50 AND id < 75"
    # last partition is open-ended above
    assert preds[3] == "id >= 75"
    # coverage check on a concrete domain: every value matches exactly one
    for v in (-5, 0, 24, 25, 49, 50, 74, 75, 99, 100, 10**9):
        matches = sum(
            (("< " in p.split(" OR ")[0] and v < int(p.split("< ")[1].split(" OR ")[0]))
             if p.startswith("id <") else
             (v >= int(p.split(">= ")[1].split(" AND")[0])
              and ("< " not in p or v < int(p.split("< ")[1]))))
            for p in preds)
        assert matches == 1, v


def test_stride_predicates_degenerate_cases():
    # single partition or inverted bounds -> one full-scan predicate
    assert len(stride_predicates("k", 0, 100, 1)) == 1
    assert len(stride_predicates("k", 100, 0, 8)) == 1
    with pytest.raises(ValueError):
        stride_predicates("k", 0, 10, 0)


def test_stride_predicates_tiny_range_still_n_partitions():
    # range smaller than partition count: stride clamps to 1, predicates
    # stay disjoint (some empty server-side, none lost)
    preds = stride_predicates("id", 0, 2, 4)
    assert len(preds) == 4
    assert preds[0] == "id < 1 OR id IS NULL"
    assert preds[3] == "id >= 3"


def test_hash_predicates_uniform_and_null_safe():
    preds = hash_predicates("name", 8)
    assert len(preds) == 8
    assert all("mod(hashtext(name::text) & 2147483647, 8)" in p
               for p in preds)
    # NULLs are routed to exactly one partition
    assert sum("name IS NULL" in p for p in preds) == 1
    with pytest.raises(ValueError):
        hash_predicates("name", -1)


def test_hash_predicates_int_min_safe():
    # hashtext() is int4; PostgreSQL abs(-2147483648::int4) raises
    # "integer out of range", so the predicate must NOT use abs() on the
    # raw hash. The sign-bit mask maps INT_MIN to 0 without overflow —
    # pin both the absence of abs() and the mask semantics.
    preds = hash_predicates("k", 4)
    assert not any("abs(" in p for p in preds)
    int_min = -2147483648
    assert (int_min & 2147483647) % 4 == 0  # bucket is well-defined


def test_read_jdbc_rejects_partition_col_without_bounds(spark):
    from osm_pg_etl_spark.sources.jdbc import read_jdbc

    with pytest.raises(ValueError, match="lower/upper"):
        read_jdbc(spark, "jdbc:postgresql://h/db", "t",
                  partition_col="id")


def test_stride_predicates_execute_on_duckdb():
    """The stride predicate family is plain ANSI SQL — execute every
    clause against a real engine (DuckDB) and assert the partitions are
    an exact disjoint cover of the table, NULL keys included. (The hash
    family is PostgreSQL-specific — hashtext() — so its syntax can only
    be exercised by the live round-trip test below.)"""
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT CASE WHEN i % 11 = 0 THEN NULL "
                "ELSE i END AS id, i AS payload FROM range(0, 1000) r(i)")
    total = con.execute("SELECT COUNT(*) FROM t").fetchone()[0]
    preds = stride_predicates("id", 0, 1000, 7)
    counts = [con.execute(f"SELECT COUNT(*) FROM t WHERE {p}").fetchone()[0]
              for p in preds]
    assert sum(counts) == total == 1000
    # disjoint: every row matches exactly one clause
    union = " + ".join(f"(CASE WHEN {p} THEN 1 ELSE 0 END)" for p in preds)
    assert con.execute(
        f"SELECT COUNT(*) FROM t WHERE ({union}) <> 1").fetchone()[0] == 0


def test_hash_predicates_execute_on_duckdb_with_hashtext_shim():
    """Execute the hash-family predicates VERBATIM on DuckDB (whose SQL
    dialect matches PostgreSQL for every construct they use: ``::text``
    casts, ``&`` bitwise and, ``mod``) with ``hashtext`` registered as a
    scalar UDF. The shim doesn't reproduce PostgreSQL's hash VALUES — it
    doesn't need to: the partition contract (every row in exactly one
    bucket, NULLs routed to bucket 0, no abs() overflow) must hold for
    ANY int4-valued hash, so the shim deliberately returns the
    adversarial values — negatives and INT_MIN itself, the value whose
    abs() aborts a real PostgreSQL scan (commit a85348d's sign-bit
    mask). The live round-trip below covers the real-server leg."""
    import duckdb

    def hashtext(s):
        if s is None:                    # PG: hashtext(NULL) IS NULL
            return None
        if s == "k13":                   # force the INT_MIN edge
            return -(2 ** 31)
        return (hash(s) % (2 ** 32)) - 2 ** 31   # full int4 range

    con = duckdb.connect()
    con.create_function("hashtext", hashtext, [str], int)
    con.execute("CREATE TABLE t AS SELECT CASE WHEN i % 11 = 0 THEN NULL "
                "ELSE 'k' || i END AS name, i AS payload "
                "FROM range(0, 1000) r(i)")
    preds = hash_predicates("name", 8)
    counts = [con.execute(f"SELECT COUNT(*) FROM t WHERE {p}").fetchone()[0]
              for p in preds]
    assert sum(counts) == 1000
    union = " + ".join(f"(CASE WHEN {p} THEN 1 ELSE 0 END)" for p in preds)
    assert con.execute(
        f"SELECT COUNT(*) FROM t WHERE ({union}) <> 1").fetchone()[0] == 0
    # NULL keys and the INT_MIN-hashing key both landed somewhere
    assert con.execute(f"SELECT COUNT(*) FROM t WHERE {preds[0]}"
                       ).fetchone()[0] >= 91   # the 91 NULL-name rows


def test_jdbc_roundtrip_embedded_derby(spark):
    """End-to-end write_jdbc -> read_jdbc through Spark's real JVM JDBC
    source against embedded Derby (which ships with Spark, so this runs
    in ANY sandbox): table create/overwrite, partition-parallel batched
    writes, and a 4-task predicate-partitioned read. Derby folds unquoted
    identifiers to uppercase while Spark writes lowercase column names,
    so the predicates quote the key — the builders take the column
    reference verbatim, which is exactly the escape hatch this needs."""
    from pyspark.sql import functions as F

    from osm_pg_etl_spark.sources.jdbc import read_jdbc, write_jdbc

    url = "jdbc:derby:memory:osm_pg_etl_rt;create=true"
    df = spark.range(0, 500).select(
        F.col("id"),
        F.when(F.col("id") % 11 == 0, None)
        .otherwise(F.concat(F.lit("k"), F.col("id"))).alias("name"))
    write_jdbc(df, url, "rt", mode="overwrite")
    # overwrite again: mode semantics must hold on an existing table
    write_jdbc(df, url, "rt", mode="overwrite")
    want = sorted((r["id"], r["name"]) for r in df.collect())
    got = read_jdbc(spark, url, "rt",
                    predicates=stride_predicates('"id"', 0, 500, 4))
    assert got.rdd.getNumPartitions() == 4
    assert sorted((r["id"], r["name"]) for r in got.collect()) == want


@pytest.mark.skipif(not os.environ.get("OSM_PG_TEST_URL"),
                    reason="no live PostgreSQL (set OSM_PG_TEST_URL, e.g. "
                           "jdbc:postgresql://localhost:5432/test)")
def test_jdbc_roundtrip_live_postgres(spark):
    """End-to-end write_jdbc -> read_jdbc round-trip against a real
    PostgreSQL, exercising BOTH predicate families server-side (the one
    leg of the reference's Postgres workflow no sandbox can cover; runs
    wherever OSM_PG_TEST_URL points at a reachable server)."""
    from pyspark.sql import functions as F

    from osm_pg_etl_spark.sources.jdbc import (
        hash_predicates, read_jdbc, stride_predicates, write_jdbc)

    url = os.environ["OSM_PG_TEST_URL"]
    user = os.environ.get("OSM_PG_TEST_USER")
    password = os.environ.get("OSM_PG_TEST_PASSWORD")
    df = spark.range(0, 500).select(
        F.col("id"),
        F.when(F.col("id") % 11 == 0, None)
        .otherwise(F.concat(F.lit("k"), F.col("id"))).alias("name"))
    write_jdbc(df, url, "osm_pg_etl_spark_rt", mode="overwrite",
               user=user, password=password)
    want = sorted((r["id"], r["name"]) for r in df.collect())
    for preds in (stride_predicates("id", 0, 500, 4),
                  hash_predicates("name", 4)):
        got = read_jdbc(spark, url, "osm_pg_etl_spark_rt",
                        predicates=preds, user=user, password=password)
        assert got.rdd.getNumPartitions() == 4
        assert sorted((r["id"], r["name"]) for r in got.collect()) == want
