"""Readers / writers / catalog helpers (SURVEY §2.1 S1-S8).

The reference's sources & sinks map as:

- S1 PBF ingest (``etl/osm-load.sh:29``)  → ``read_table`` over pre-converted
  parquet. Parsing ``.osm.pbf`` itself is an external conversion concern;
  the relational model starts at parquet files with the schemas in
  :mod:`osm_pg_etl_spark.schema`.
- S2/S3 DDL + CTAS (``osm-explore.sql:9-16``) → ``write_table`` /
  ``materialize`` (temp-view registration, the cheap CTAS).
- S4 INSERT…SELECT append → ``append_slices`` (unionByName — appends in Spark
  are unions of immutable DataFrames, not mutations).
- S7 CSV COPY write-back (``osm-pg-etl.md:97-105``) → ``write_table`` with
  fmt="csv"; JDBC available via ``df.write.jdbc`` when a database URL exists.
- S8 igraph edge-list export (``osm-pg-etl.md:38-62``) → :mod:`..operators.export`.
"""

from __future__ import annotations

import os
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession


# logical operators that already shape partitioning (or imply a shuffle
# upstream): when one is present, spread() trusts the plan instead of paying
# a full physical compile just to count partitions
_SHAPED_OPS = ("Join", "Aggregate", "Repartition", "Window", "Deduplicate",
               "Sort", "RebalancePartitions")


def spread(df: DataFrame, factor: int = 1) -> DataFrame:
    """Ensure at least cluster-parallelism partitions before a CPU-heavy
    narrow stage.

    Small inputs (a single-row-group parquet file, a collected dimension)
    arrive as one task, serializing per-row work like shingling or hashing
    on one core. When the plan already has enough partitions — the normal
    case at scale — this is the identity, so no shuffle is added to big
    pipelines.

    The partition-count probe (``df.rdd``) compiles the full physical plan,
    so it is gated to scan-rooted inputs: if the analyzed plan already
    contains a shuffle-shaping operator (join/agg/repartition/...), the
    upstream stage chose the partitioning and spread() is the identity
    without any probe.
    """
    plan = df._jdf.queryExecution().analyzed().toString()
    if any(op in plan for op in _SHAPED_OPS):
        return df
    target = df.sparkSession.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def read_table(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Read one table. Column pruning + predicate pushdown happen at the
    parquet scan (verify with ``df.explain``: PushedFilters / ReadSchema)."""
    return spark.read.format(fmt).load(path)


def read_testdata(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated synthetic table (TESTDATA.md).

    The driver wrote timestamps as parquet TIMESTAMP(NANOS), which Spark's
    parquet reader rejects by default; read them as raw nanos (legacy conf)
    and convert to TIMESTAMP_NTZ at microsecond precision — the same
    truncation DuckDB applies, so values compare equal across engines."""
    from pyspark.sql import functions as F  # noqa: PLC0415
    from pyspark.sql.types import LongType  # noqa: PLC0415

    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        df = spark.read.parquet(path)
        df.schema  # force schema resolution
    except Exception:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
    # Whichever path was taken: if a known timestamp column came back as raw
    # nanos (long), convert. timestamp_micros() builds an instant; with a
    # UTC session the NTZ cast is an identity on the wall-clock value,
    # matching DuckDB's nanos→micros truncation.
    for field in df.schema.fields:
        if field.name in ("ts", "tstamp", "o_orderdate", "l_shipdate") \
                and isinstance(field.dataType, LongType):
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            # integer division: epoch-nanos (~1.8e18) exceeds a double's
            # 53-bit mantissa, so `/ 1000` + floor would be off by ±1 µs
            micros = F.expr(f"{field.name} div 1000")
            df = df.withColumn(
                field.name, F.timestamp_micros(micros).cast("timestamp_ntz"))
    return df


def read_osm(spark: SparkSession, base_dir: str, names: Iterable[str] = ("nodes", "ways", "way_nodes")) -> dict[str, DataFrame]:
    """Read the OSM relational tables from a directory of parquet files."""
    return {n: read_testdata(spark, base_dir, n) for n in names}


def materialize(df: DataFrame, name: str, cache: bool = True) -> DataFrame:
    """CTAS-lite (S3): register as temp view; optionally cache.

    The reference materializes every intermediate as a real table, which acts
    as an optimization fence and enables reuse (SURVEY §4). In Spark the
    equivalent decision is explicit caching of reused subtrees.
    """
    if cache:
        df = df.cache()
    df.createOrReplaceTempView(name)
    return df


def write_table(df: DataFrame, path: str, fmt: str = "parquet",
                mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    """Persist a derived table (S3 with real storage).

    ``partition_by`` substitutes for the reference's CLUSTER/indexing
    (``etl/pgsnapshot_schema_0.6.sql:112-116``): at 100 TB, partition derived
    way-scoped tables by a bucketed key so downstream equi-joins prune."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.format(fmt).save(path)


def write_bucketed(df: DataFrame, name: str, bucket_cols: list[str],
                   num_buckets: int = 32, path: str | None = None,
                   fmt: str = "parquet") -> None:
    """Persist bucketed by join key — the 100 TB substitute for the
    reference's btree/CLUSTER physical tuning: two tables bucketed on the
    same key by the same bucket count equi-join WITHOUT a shuffle (verify:
    no Exchange above the scans in the join plan).

    Bucketing requires the table-catalog write path (``saveAsTable``);
    pass ``path`` to make it external."""
    w = (df.write.mode("overwrite").format(fmt)
         .bucketBy(num_buckets, *bucket_cols).sortBy(*bucket_cols))
    if path:
        w = w.option("path", path)
    w.saveAsTable(name)


def append_slices(slices: Iterable[DataFrame]) -> DataFrame:
    """INSERT…SELECT-by-append (S4, U2): union heterogeneous slices by name.

    ``allowMissingColumns=True`` mirrors appending into a wider table with
    implicit NULLs (``osm-pois-extract.sql:9-48``)."""
    out: DataFrame | None = None
    for s in slices:
        out = s if out is None else out.unionByName(s, allowMissingColumns=True)
    if out is None:
        raise ValueError("append_slices needs at least one slice")
    return out
