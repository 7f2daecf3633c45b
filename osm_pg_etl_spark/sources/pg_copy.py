"""COPY-protocol PostgreSQL source/sink over per-task ``psql`` streams.

The reference's bulk path into PostgreSQL is COPY, not INSERT: osmosis'
pgsnapshot loader and osm2pgsql both stream COPY because it is the only
way to load at disk speed (``osm-pg-etl.md``: osmosis ``--write-pgsql``;
``etl/osm-load.sh`` drives it). :mod:`.jdbc` covers the incremental
INSERT-sized leg but needs the PostgreSQL JDBC driver jar on the Spark
classpath; this module covers the BULK leg with zero JVM dependencies —
each Spark task pipes PostgreSQL's COPY **text format** through a
``psql`` subprocess:

- **write**: ``df.foreachPartition`` → one ``COPY t FROM STDIN`` stream
  per partition. N partitions = N concurrent COPY streams, which is
  exactly how high-throughput loaders parallelize (PostgreSQL happily
  runs concurrent COPYs into one heap; contention is on WAL, so
  real deployments size N to the WAL bandwidth, not to the executor
  count).
- **read**: one task per WHERE predicate (reusing
  :func:`..sources.jdbc.stride_predicates` /
  :func:`..sources.jdbc.hash_predicates`), each running
  ``COPY (SELECT ... WHERE pred) TO STDOUT`` — the filter executes
  server-side, so each task streams only its slice.

COPY *text* format (tab-delimited, ``\\N`` NULL sentinel, backslash
escapes) is used instead of CSV deliberately: CSV cannot distinguish the
quoted string ``"\\N"`` from an unquoted NULL once a generic CSV reader
has stripped quotes, while text format is bijective — ``\\N`` is NULL,
``\\\\N`` is the two-character string. :func:`pg_escape` /
:func:`pg_unescape` implement the (documented, stable) escape table and
are property-tested for round-trip identity.

Everything here is driven by a libpq connection string (DSN), e.g.
``host=/tmp/pgsock user=pguser dbname=test`` — the same string every
libpq tool accepts — so tests run against any reachable server and skip
cleanly elsewhere (:func:`pg_available`).
"""

from __future__ import annotations

import subprocess
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# ---------------------------------------------------------------- escaping

_ESCAPES = {"\\": "\\\\", "\t": "\\t", "\n": "\\n", "\r": "\\r"}
_UNESCAPES = {"\\": "\\", "t": "\t", "n": "\n", "r": "\r",
              "b": "\b", "f": "\f", "v": "\v"}


def pg_escape(s: str) -> str:
    """Escape one field for COPY text format (backslash, tab, LF, CR)."""
    out = []
    for ch in s:
        out.append(_ESCAPES.get(ch, ch))
    return "".join(out)


def pg_unescape(s: str) -> str:
    """Inverse of COPY text-format output escaping."""
    out = []
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "\\" and i + 1 < n:
            out.append(_UNESCAPES.get(s[i + 1], s[i + 1]))
            i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


# ------------------------------------------------------------- type mapping

_PG_TYPE = {
    T.LongType: "bigint", T.IntegerType: "integer",
    T.ShortType: "smallint", T.DoubleType: "double precision",
    T.FloatType: "real", T.StringType: "text",
    T.BooleanType: "boolean", T.TimestampType: "timestamp",
    T.DateType: "date",
}


def pg_ddl(schema: T.StructType, table: str) -> str:
    """CREATE TABLE statement for a Spark schema (core scalar types; a
    loud error beats a silently-wrong column for anything else)."""
    cols = []
    for f in schema.fields:
        pg = _PG_TYPE.get(type(f.dataType))
        if pg is None:
            raise ValueError(
                f"pg_copy supports core scalar types only; column "
                f"{f.name!r} is {f.dataType.simpleString()} — cast or "
                "serialize it (e.g. to_json) before the sink")
        cols.append(f'"{f.name}" {pg}')
    return f'CREATE TABLE IF NOT EXISTS "{table}" ({", ".join(cols)})'


def _to_copy_field(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, str):
        return pg_escape(v)
    if isinstance(v, float):
        return repr(v)
    return str(v)  # int, Decimal, datetime/date (ISO str() is PG-valid)


def _from_copy_field(s: str, dt: T.DataType):
    if s == "\\N":
        return None
    if isinstance(dt, T.StringType):
        return pg_unescape(s)
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType)):
        return int(s)
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return float(s)
    if isinstance(dt, T.BooleanType):
        return s == "t"
    if isinstance(dt, T.TimestampType):
        from datetime import datetime
        return datetime.fromisoformat(s)
    if isinstance(dt, T.DateType):
        from datetime import date
        return date.fromisoformat(s)
    raise ValueError(f"unsupported read type {dt.simpleString()}")


# ---------------------------------------------------------------- plumbing

_PSQL_ARGS = ["-X", "-q", "-v", "ON_ERROR_STOP=1", "-At", "-c"]


def _psql(dsn: str, sql: str, stdin: str | None = None) -> str:
    """Run one statement through psql, returning stdout; raises with the
    server's stderr on any error (ON_ERROR_STOP). For DDL and small
    results — the data paths use the streaming variants below."""
    proc = subprocess.run(["psql", dsn, *_PSQL_ARGS, sql],
                          input=stdin, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(f"psql failed ({sql[:120]}...): {proc.stderr}")
    return proc.stdout


def _psql_stream_out(dsn: str, sql: str):
    """Yield stdout lines of one psql command WITHOUT buffering the whole
    result — a COPY TO STDOUT task holds one line at a time regardless of
    slice size. stderr goes to a temp file (no pipe deadlock) and is
    raised on a nonzero exit."""
    import tempfile

    with tempfile.TemporaryFile(mode="w+") as err:
        proc = subprocess.Popen(["psql", dsn, *_PSQL_ARGS, sql],
                                stdout=subprocess.PIPE, stderr=err,
                                text=True)
        assert proc.stdout is not None
        exhausted = False
        try:
            for line in proc.stdout:
                yield line.rstrip("\n")
            exhausted = True
        finally:
            # The finally also runs on GeneratorExit (a consumer such as
            # a Spark limit/take abandoning the generator early) — then
            # the child psql is still streaming COPY output and must be
            # terminated or it leaks until SIGPIPE.
            proc.stdout.close()
            if not exhausted and proc.poll() is None:
                proc.terminate()
            rc = proc.wait()
        if rc != 0:
            err.seek(0)
            raise RuntimeError(f"psql failed ({sql[:120]}...): {err.read()}")


def _psql_stream_in(dsn: str, sql: str, lines) -> None:
    """Feed an iterator of lines to one psql command's stdin without
    materializing the partition — a COPY FROM STDIN task holds one row
    at a time.

    Runs psql WITHOUT ``-q`` and verifies the server's ``COPY <n>``
    command tag against the number of lines actually written: psql
    exiting 0 while ignoring stdin (SQL that is not a COPY FROM STDIN)
    or consuming only part of it must be an error, not a quiet success.
    Checking only for a BrokenPipeError is racy — writes smaller than
    the OS pipe buffer succeed even if psql never reads them."""
    import re
    import tempfile

    args = [a for a in _PSQL_ARGS if a != "-q"]
    with tempfile.TemporaryFile(mode="w+") as err:
        proc = subprocess.Popen(["psql", dsn, *args, sql],
                                stdin=subprocess.PIPE,
                                stdout=subprocess.PIPE, stderr=err,
                                text=True)
        assert proc.stdin is not None and proc.stdout is not None
        n_written = 0
        try:
            # psql aborting mid-COPY (e.g. bad input syntax) closes its
            # stdin and the next write raises BrokenPipeError; swallow it
            # so the rc!=0 check below reports the server's actual stderr
            # instead of an opaque pipe error.
            try:
                for line in lines:
                    proc.stdin.write(line)
                    proc.stdin.write("\n")
                    n_written += 1
            except BrokenPipeError:
                pass
        finally:
            try:
                proc.stdin.close()
            except (BrokenPipeError, OSError):
                pass
            out = proc.stdout.read()
            proc.stdout.close()
            rc = proc.wait()
        if rc != 0:
            err.seek(0)
            raise RuntimeError(f"psql failed ({sql[:120]}...): {err.read()}")
        m = re.search(r"^COPY (\d+)$", out, re.MULTILINE)
        if m is None or int(m.group(1)) != n_written:
            err.seek(0)
            raise RuntimeError(
                f"psql exited 0 but acknowledged "
                f"{'no COPY' if m is None else 'COPY ' + m.group(1)} for "
                f"{n_written} rows written ({sql[:120]}...) — rows were "
                f"silently dropped: {out[:200]!r} {err.read()[:400]}")


def pg_available(dsn: str) -> bool:
    """True when a server is reachable at ``dsn`` and psql exists."""
    try:
        return _psql(dsn, "SELECT 1").strip() == "1"
    except (RuntimeError, FileNotFoundError, OSError):
        return False


# -------------------------------------------------------------------- sink

def copy_write(df: DataFrame, dsn: str, table: str,
               mode: str = "append") -> None:
    """Bulk-load ``df`` into PostgreSQL, one concurrent COPY stream per
    partition. ``mode``: ``append`` (create if absent) or ``overwrite``
    (drop + recreate). DDL runs once on the driver; each task then
    streams its partition through ``COPY ... FROM STDIN`` — no row ever
    passes through the driver.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    if mode == "overwrite":
        _psql(dsn, f'DROP TABLE IF EXISTS "{table}"')
    _psql(dsn, pg_ddl(df.schema, table))
    names = [f'"{f.name}"' for f in df.schema.fields]
    copy_sql = f'COPY "{table}" ({", ".join(names)}) FROM STDIN'

    def load(rows) -> None:
        it = iter(rows)
        try:
            first = next(it)
        except StopIteration:
            return  # empty partition: no COPY stream at all
        from itertools import chain
        _psql_stream_in(
            dsn, copy_sql,
            ("\t".join(_to_copy_field(v) for v in r)
             for r in chain((first,), it)))

    df.foreachPartition(load)


# ------------------------------------------------------------------ source

def copy_read(spark: SparkSession, dsn: str, table: str,
              schema: T.StructType | str,
              predicates: Sequence[str] | None = None,
              select: str | None = None) -> DataFrame:
    """Partitioned COPY read: one task per predicate, each streaming
    ``COPY (SELECT cols FROM table WHERE pred) TO STDOUT`` — the slicing
    predicate is evaluated server-side, so tasks pull disjoint row sets
    in parallel (use :func:`..sources.jdbc.stride_predicates` or
    :func:`..sources.jdbc.hash_predicates`). Without predicates: one
    full-scan task (tiny tables only).

    ``schema`` is explicit (StructType or DDL string) — the same
    contract as ``spark.read.schema(...)``; guessing types from text
    output is how silent corruption happens. ``select`` overrides the
    projection with a raw server-side select list (e.g.
    ``'id, tags::text AS tags, ST_X(geom) AS lon'``) whose output
    columns must match ``schema`` positionally — the pgsnapshot reader
    uses this to cast hstore/geometry server-side.
    """
    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    preds = list(predicates) if predicates is not None else ["TRUE"]
    cols = select if select is not None else ", ".join(
        f'"{f.name}"' for f in schema.fields)
    dtypes = [f.dataType for f in schema.fields]

    def fetch(it):
        for pred in it:
            sql = (f'COPY (SELECT {cols} FROM "{table}" WHERE {pred}) '
                   "TO STDOUT")
            for line in _psql_stream_out(dsn, sql):
                # COPY TO STDOUT emits a bare empty line for a
                # single-text-column row whose value is '' — only a
                # multi-column schema can treat an empty line as noise.
                if not line and len(dtypes) > 1:
                    continue
                parts = _split_copy_line(line)
                if len(parts) != len(dtypes):
                    raise ValueError(
                        f"COPY row has {len(parts)} fields but schema "
                        f"declares {len(dtypes)} (predicate {pred!r}; "
                        f"check the `select` column list): {line[:200]!r}")
                yield tuple(_from_copy_field(p, dt)
                            for p, dt in zip(parts, dtypes))

    rdd = spark.sparkContext.parallelize(preds, len(preds)).mapPartitions(fetch)
    return spark.createDataFrame(rdd, schema)


def _split_copy_line(line: str) -> list[str]:
    """Split one COPY text-format line on UNESCAPED tabs (an escaped tab
    is ``\\t`` — two characters — and must stay inside its field)."""
    parts, cur, i, n = [], [], 0, len(line)
    while i < n:
        ch = line[i]
        if ch == "\\" and i + 1 < n:
            cur.append(ch)
            cur.append(line[i + 1])
            i += 2
        elif ch == "\t":
            parts.append("".join(cur))
            cur = []
            i += 1
        else:
            cur.append(ch)
            i += 1
    parts.append("".join(cur))
    return parts
