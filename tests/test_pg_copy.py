"""COPY-protocol PostgreSQL source/sink (sources.pg_copy).

Escape/split/DDL logic is pure and always tested. The live legs — a
write→read round-trip with adversarial strings, and the predicate
families validated against PostgreSQL's REAL ``hashtext()`` (the one
thing the DuckDB shim in test_jdbc.py cannot check) — run whenever a
server is reachable at ``OSM_PG_TEST_DSN`` (libpq keyword string, e.g.
``host=/tmp/pgsock user=pguser dbname=test``) and skip cleanly
otherwise.
"""

import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_pg_etl_spark.sources.jdbc import hash_predicates, stride_predicates
from osm_pg_etl_spark.sources.pg_copy import (
    _split_copy_line, copy_read, copy_write, pg_available, pg_ddl,
    pg_escape, pg_unescape, _psql)

DSN = os.environ.get("OSM_PG_TEST_DSN", "")
live = pytest.mark.skipif(
    not (DSN and pg_available(DSN)),
    reason="no live PostgreSQL (set OSM_PG_TEST_DSN, e.g. "
           "'host=/tmp/pgsock user=pguser dbname=test')")


# ------------------------------------------------------------ pure pieces

@given(st.text())
@settings(max_examples=300, deadline=None)
def test_escape_roundtrip_identity(s):
    assert pg_unescape(pg_escape(s)) == s


def test_escape_covers_copy_metacharacters():
    assert pg_escape("a\tb\nc\rd\\e") == "a\\tb\\nc\\rd\\\\e"
    # the NULL sentinel is NOT produced by escaping any real string:
    # "\N" escapes its backslash, so it can't collide with NULL's \N
    assert pg_escape("\\N") == "\\\\N"


def test_split_copy_line_keeps_escaped_tabs_inside_fields():
    # field1 = "a\tb" (escaped), field2 = NULL, field3 = "c"
    assert _split_copy_line("a\\tb\t\\N\tc") == ["a\\tb", "\\N", "c"]


def test_pg_ddl_maps_core_types_and_rejects_nested():
    from pyspark.sql import types as T

    s = T.StructType([T.StructField("id", T.LongType()),
                      T.StructField("name", T.StringType()),
                      T.StructField("ok", T.BooleanType())])
    assert pg_ddl(s, "t") == ('CREATE TABLE IF NOT EXISTS "t" '
                              '("id" bigint, "name" text, "ok" boolean)')
    bad = T.StructType([T.StructField("v", T.ArrayType(T.LongType()))])
    with pytest.raises(ValueError, match="to_json"):
        pg_ddl(bad, "t")


# -------------------------------------------------------------- live legs

@live
def test_copy_roundtrip_adversarial_strings(spark):
    """write→read round-trip through real COPY streams, with every COPY
    metacharacter in the payload: tabs, newlines, CRs, backslashes, the
    literal two-character string ``\\N`` (which must NOT come back as
    NULL), real NULLs, empty strings, floats and booleans."""
    from pyspark.sql import types as T

    rows = [
        (1, "plain", 1.5, True),
        (2, "tab\there", -0.0, False),
        (3, "new\nline and cr\r.", 1e-7, None),
        (4, "back\\slash and \\N literal", float("inf"), True),
        (5, None, None, None),
        (6, "", 2.0, False),
    ]
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("s", T.StringType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("ok", T.BooleanType())])
    df = spark.createDataFrame(rows, schema).repartition(3)
    copy_write(df, DSN, "pg_copy_rt", mode="overwrite")

    got = copy_read(spark, DSN, "pg_copy_rt", schema,
                    predicates=stride_predicates("id", 1, 7, 3))
    assert got.rdd.getNumPartitions() == 3
    assert sorted(got.collect()) == sorted(rows)
    # the literal "\N" string survived as a string, not a NULL
    assert [r["s"] for r in got.collect() if r["id"] == 4] == \
        ["back\\slash and \\N literal"]


@live
def test_copy_write_append_vs_overwrite(spark):
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("id", T.LongType())])
    df = spark.createDataFrame([(1,), (2,)], schema)
    copy_write(df, DSN, "pg_copy_modes", mode="overwrite")
    copy_write(df, DSN, "pg_copy_modes", mode="append")
    n = _psql(DSN, 'SELECT count(*) FROM "pg_copy_modes"').strip()
    assert n == "4"
    copy_write(df, DSN, "pg_copy_modes", mode="overwrite")
    n = _psql(DSN, 'SELECT count(*) FROM "pg_copy_modes"').strip()
    assert n == "2"
    with pytest.raises(ValueError, match="append|overwrite"):
        copy_write(df, DSN, "pg_copy_modes", mode="errorifexists")


@live
def test_hash_predicates_against_real_hashtext():
    """The partition contract — every row in exactly one bucket, NULLs
    routed to bucket 0, no integer-out-of-range abort — validated against
    PostgreSQL's real ``hashtext()`` over 100k keys (test_jdbc.py's
    DuckDB shim checks the same contract under an adversarial fake hash;
    this is the real-server leg)."""
    _psql(DSN, 'DROP TABLE IF EXISTS "pg_hash_probe"')
    _psql(DSN, 'CREATE TABLE "pg_hash_probe" AS SELECT CASE WHEN i % 11 = 0 '
               "THEN NULL ELSE 'k' || i END AS name, i AS payload "
               "FROM generate_series(0, 99999) i")
    preds = hash_predicates("name", 8)
    counts = [int(_psql(
        DSN, f'SELECT count(*) FROM "pg_hash_probe" WHERE {p}').strip())
        for p in preds]
    assert sum(counts) == 100_000
    # disjoint cover: every row matches exactly one predicate
    union = " + ".join(f"(CASE WHEN {p} THEN 1 ELSE 0 END)" for p in preds)
    bad = _psql(DSN, f'SELECT count(*) FROM "pg_hash_probe" '
                     f"WHERE ({union}) <> 1").strip()
    assert bad == "0"
    # NULL keys (9091 of them) landed in bucket 0's predicate
    assert counts[0] >= 9091
    # uniformity sanity on the real hash: no bucket over 2x the mean
    nonnull = sum(counts) - 9091
    assert max(counts[1:]) < 2 * (nonnull / 7)
    # regression (commit a85348d): an abs()-based predicate would abort
    # the scan for keys hashing to INT_MIN; the shipped mask form must
    # never contain abs(
    assert not any("abs(" in p for p in preds)


@live
def test_stride_predicates_against_live_server():
    _psql(DSN, 'DROP TABLE IF EXISTS "pg_stride_probe"')
    _psql(DSN, 'CREATE TABLE "pg_stride_probe" AS SELECT CASE WHEN '
               "i % 11 = 0 THEN NULL ELSE i END AS id, i AS payload "
               "FROM generate_series(0, 999) i")
    preds = stride_predicates("id", 0, 1000, 7)
    counts = [int(_psql(
        DSN, f'SELECT count(*) FROM "pg_stride_probe" WHERE {p}').strip())
        for p in preds]
    assert sum(counts) == 1000
    union = " + ".join(f"(CASE WHEN {p} THEN 1 ELSE 0 END)" for p in preds)
    assert _psql(DSN, f'SELECT count(*) FROM "pg_stride_probe" '
                      f"WHERE ({union}) <> 1").strip() == "0"


# ------------------------------------------------- round-7 regressions

@live
def test_copy_error_reports_server_stderr_not_broken_pipe(spark):
    """psql aborting mid-COPY must surface the server's error message,
    not the BrokenPipeError the abort provokes on our writing side."""
    from pyspark.sql import types as T

    df = spark.createDataFrame([(1, "x")], "id long, v string")
    copy_write(df, DSN, "r7_pipe", mode="overwrite")
    # now feed a row whose id is not an integer -> server aborts COPY
    bad = spark.createDataFrame([("notanint", "y")], "id string, v string")
    with pytest.raises(Exception) as ei:
        copy_write(bad.select(
            bad.id.alias("id"), bad.v.alias("v")), DSN, "r7_pipe")
    msg = str(ei.value)
    assert "invalid input syntax" in msg, msg
    _psql(DSN, 'DROP TABLE IF EXISTS "r7_pipe"')


@live
def test_copy_read_rejects_field_count_mismatch(spark):
    """A `select` override with more columns than the declared schema
    must fail loudly, not silently truncate fields."""
    _psql(DSN, 'DROP TABLE IF EXISTS "r7_mismatch"')
    _psql(DSN, 'CREATE TABLE "r7_mismatch" (a int, b int, c int)')
    _psql(DSN, 'INSERT INTO "r7_mismatch" VALUES (1, 2, 3)')
    df = copy_read(spark, DSN, "r7_mismatch", "a int, b int",
                   select="a, b, c")
    with pytest.raises(Exception, match="3 fields but schema declares 2"):
        df.collect()
    _psql(DSN, 'DROP TABLE "r7_mismatch"')


@live
def test_pgload_array_preserves_null_elements(spark, tmp_path):
    """CLI pgload stages array<long> as a PostgreSQL array literal;
    null elements must survive as NULL, not be silently dropped."""
    import subprocess
    import sys

    from pyspark.sql import Row

    p = str(tmp_path / "arr.parquet")
    spark.createDataFrame(
        [Row(id=1, xs=[1, None, 3])], "id long, xs array<long>"
    ).write.mode("overwrite").parquet(p)
    r = subprocess.run(
        [sys.executable, "-m", "osm_pg_etl_spark", "pgload",
         p, "--dsn", DSN, "--table", "r7_arr"],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    out = _psql(DSN, 'SELECT xs FROM "r7_arr"').strip()
    assert out == "{1,NULL,3}", out
    _psql(DSN, 'DROP TABLE IF EXISTS "r7_arr"')


# ------------------------------------------------- round-8 regressions

@live
def test_single_text_column_empty_string_rows_survive(spark):
    """COPY TO STDOUT emits a bare empty line for a single-text-column
    row whose value is '' — copy_read must yield it as one empty field,
    not silently drop the row (ADVICE r7: the old `if not line: continue`
    ate these before the field-count guard could see them)."""
    from pyspark.sql import types as T

    _psql(DSN, 'DROP TABLE IF EXISTS "r8_onecol"')
    _psql(DSN, 'CREATE TABLE "r8_onecol" (s text)')
    _psql(DSN, "INSERT INTO \"r8_onecol\" VALUES ('a'), (''), (NULL), ('b')")
    schema = T.StructType([T.StructField("s", T.StringType())])
    got = sorted(
        (r["s"] for r in copy_read(spark, DSN, "r8_onecol", schema).collect()),
        key=lambda v: (v is not None, v))
    assert got == [None, "", "a", "b"], got
    _psql(DSN, 'DROP TABLE "r8_onecol"')


@live
def test_stream_in_raises_when_psql_ignores_stdin():
    """If psql exits 0 WITHOUT consuming stdin (the SQL is not a COPY
    FROM STDIN), rows were silently discarded — _psql_stream_in must
    raise instead of reporting quiet success (ADVICE r7). Verified via
    the COPY command-tag count, so it fires even for inputs smaller
    than the OS pipe buffer (where no BrokenPipeError ever surfaces)."""
    from osm_pg_etl_spark.sources.pg_copy import _psql_stream_in

    # SMALL input: all writes land in the pipe buffer, psql never reads
    # them, exits 0 — only the tag check can catch this.
    with pytest.raises(RuntimeError, match="silently dropped"):
        _psql_stream_in(DSN, "SELECT 1", iter(["x", "y"]))
    # large input: pipe fills, writes see EPIPE — same verdict.
    lines = ("x" * 1024 for _ in range(512))
    with pytest.raises(RuntimeError, match="silently dropped"):
        _psql_stream_in(DSN, "SELECT 1", lines)
    # and a genuine COPY still succeeds with the tag check in place
    _psql(DSN, 'DROP TABLE IF EXISTS "r8_tag"')
    _psql(DSN, 'CREATE TABLE "r8_tag" (v text)')
    _psql_stream_in(DSN, 'COPY "r8_tag" (v) FROM STDIN',
                    iter(["a", "b", "c"]))
    assert _psql(DSN, 'SELECT COUNT(*) FROM "r8_tag"').strip() == "3"
    _psql(DSN, 'DROP TABLE "r8_tag"')
