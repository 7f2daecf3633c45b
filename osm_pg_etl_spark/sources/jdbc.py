"""JDBC (PostgreSQL) source/sink — the "read/transform/write over
Postgres" leg of the reference workflow (``osm-pg-etl.md``: osmosis loads
a pgsnapshot schema into PostgreSQL; analyses read and write those
tables).

Design for scale: a naive ``spark.read.jdbc(url, table)`` is ONE task
holding one connection — at any real table size that's the bottleneck, so
every reader here is partitioned:

- numeric/temporal keys: stride partitioning (Spark's built-in
  lowerBound/upperBound/numPartitions — each task reads one range);
- arbitrary/skewed/string keys: explicit predicate partitioning — one
  WHERE clause per task, built either from range boundaries (aligned with
  :mod:`..functions.partitioning`'s deterministic buckets) or from a
  hash-mod bucketing that needs no statistics at all.

The predicate builders are pure functions (unit-tested without a server);
the read/write wrappers only assemble Spark DataSource options, so every
scale-relevant decision is visible and testable here.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

PG_DRIVER = "org.postgresql.Driver"

# Known JDBC URL scheme -> driver class. Derby ships WITH Spark (the
# metastore dependency), so the embedded-Derby entry lets the JDBC
# round-trip run in any sandbox without vendoring a jar; everything else
# (including PostgreSQL, the reference's server) needs its driver jar on
# the Spark classpath (vendor/jars/, picked up by tests/conftest.py).
_DRIVERS = {
    "jdbc:postgresql:": PG_DRIVER,
    "jdbc:derby:": "org.apache.derby.iapi.jdbc.AutoloadedDriver",
}


def _driver_for(url: str, driver: str | None) -> str:
    if driver is not None:
        return driver
    for prefix, cls in _DRIVERS.items():
        if url.startswith(prefix):
            return cls
    return PG_DRIVER


def stride_predicates(col: str, lower: int, upper: int,
                      num_partitions: int) -> list[str]:
    """Range predicates equivalent to Spark's internal JDBC striding —
    materialized so they can be inspected, logged, or post-processed
    (e.g. splitting a known-hot range). Rows outside [lower, upper) are
    captured by the open-ended first/last predicates, mirroring Spark's
    own behavior (no silent row loss from bad bounds).
    """
    if num_partitions <= 0:
        raise ValueError(f"num_partitions must be positive, got {num_partitions}")
    if num_partitions == 1 or upper <= lower:
        return [f"{col} IS NOT NULL OR {col} IS NULL"]  # single full scan
    stride = (upper - lower) // num_partitions or 1
    preds = []
    for i in range(num_partitions):
        lo = lower + i * stride
        hi = lower + (i + 1) * stride
        if i == 0:
            preds.append(f"{col} < {hi} OR {col} IS NULL")
        elif i == num_partitions - 1:
            preds.append(f"{col} >= {lo}")
        else:
            preds.append(f"{col} >= {lo} AND {col} < {hi}")
    return preds


def hash_predicates(col: str, num_partitions: int,
                    cast: str = "::text") -> list[str]:
    """Statistics-free uniform partitioning for arbitrary key types:
    ``mod(abs(hashtext(col::text)), N) = i`` per task (hashtext is
    PostgreSQL's built-in string hash). Uniform regardless of key
    distribution — the right default for skewed or non-numeric keys,
    at the cost of N server-side scans of the hash expression (an
    expression index on it makes this cheap for repeated ETL).

    hashtext() returns int4; PostgreSQL ``abs()`` on the int4 value
    -2147483648 raises "integer out of range", which would
    deterministically abort whichever partition scans a key hashing to
    INT_MIN. Masking the sign bit (``& 2147483647``) avoids the abs()
    overflow entirely and keeps the bucket uniform.
    """
    if num_partitions <= 0:
        raise ValueError(f"num_partitions must be positive, got {num_partitions}")
    expr = f"mod(hashtext({col}{cast}) & 2147483647, {num_partitions})"
    preds = [f"{expr} = {i}" for i in range(num_partitions)]
    # NULL keys hash to NULL -> captured explicitly by partition 0
    preds[0] = f"({preds[0]}) OR {col} IS NULL"
    return preds


def read_jdbc(spark: SparkSession, url: str, table: str,
              partition_col: str | None = None,
              lower: int | None = None, upper: int | None = None,
              num_partitions: int = 32,
              predicates: Sequence[str] | None = None,
              fetchsize: int = 10_000,
              user: str | None = None,
              password: str | None = None,
              driver: str | None = None) -> DataFrame:
    """Partitioned JDBC read. Three modes, strictest first:

    - ``predicates``: one task per WHERE clause (from
      :func:`stride_predicates` / :func:`hash_predicates` or hand-built);
    - ``partition_col`` + bounds: Spark's built-in striding;
    - neither: single-task read (only for tiny tables — a loud comment,
      not a default anyone should reach at scale).

    ``fetchsize`` overrides the Postgres JDBC default of fetching the
    ENTIRE result set into executor memory before the first row is
    processed (cursor-based streaming needs a non-zero fetchsize and
    autocommit off, which Spark's JDBC source sets).
    """
    props = {"driver": _driver_for(url, driver), "fetchsize": str(fetchsize)}
    if user is not None:
        props["user"] = user
    if password is not None:
        props["password"] = password
    if predicates is not None:
        return spark.read.jdbc(url, table, predicates=list(predicates),
                               properties=props)
    if partition_col is not None:
        if lower is None or upper is None:
            raise ValueError(
                "partition_col requires explicit lower/upper bounds: let "
                "the caller run SELECT min(col), max(col) once rather "
                "than hiding a full-table scan here")
        return spark.read.jdbc(
            url, table, column=partition_col, lowerBound=lower,
            upperBound=upper, numPartitions=num_partitions,
            properties=props)
    return spark.read.jdbc(url, table, properties=props)


def write_jdbc(df: DataFrame, url: str, table: str,
               mode: str = "append", batchsize: int = 10_000,
               rewrite_batched_inserts: bool = True,
               user: str | None = None,
               password: str | None = None,
               driver: str | None = None) -> None:
    """Partition-parallel JDBC write: each task opens one connection and
    writes its partition in ``batchsize`` batches.
    ``reWriteBatchedInserts=true`` makes the Postgres driver collapse each
    batch into one multi-row INSERT (~5-10x on bulk loads — the JDBC-side
    analog of the reference's osmosis COPY loading). For true COPY-speed
    initial loads, write parquet/csv and server-side COPY it; this sink is
    for incremental/CDC-sized writes.
    """
    props = {"driver": _driver_for(url, driver), "batchsize": str(batchsize)}
    if _driver_for(url, driver) == PG_DRIVER:
        # PostgreSQL-driver-specific URL property; other drivers may
        # reject unknown connection attributes (Derby does)
        props["reWriteBatchedInserts"] = str(rewrite_batched_inserts).lower()
    if user is not None:
        props["user"] = user
    if password is not None:
        props["password"] = password
    df.write.jdbc(url, table, mode=mode, properties=props)
