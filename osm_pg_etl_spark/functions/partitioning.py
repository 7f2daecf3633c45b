"""Deterministic range bucketing for distributed prefix sums.

Several operators (``operators.text.pack_positions``, ungrouped
``operators.stats.weighted_median``, ``operators.graphs.create_topology``)
need a *global* ordered prefix sum without a single-partition window: split
the key space into ordered buckets, run a per-bucket window, and add
broadcast cumulative per-bucket offsets.

The round-2 construction derived the bucket from ``spark_partition_id()``
after ``repartitionByRange`` and relied on ``.cache()`` to pin the
assignment.  That is a correctness hazard: cache materialization is not a
barrier, and a recomputed range exchange may sample different boundaries,
silently shifting every downstream offset (driver hash-fail on
``pack_positions`` in round 2).  This module replaces it with buckets that
are a **pure function of the data**:

1. one ``count()`` + one bounded ``collect()`` of a hash-deterministic
   sample of keys (``xxhash64(key) % m == 0`` — independent of physical
   partitioning, unlike ``DataFrame.sample`` whose per-partition seeds move
   with the split layout);
2. sorted equally-spaced sample ranks become the boundary list (≤
   ``num_buckets - 1`` literals, broadcast inside the plan as constants);
3. the bucket id is ``count{b in boundaries : key > b}`` — a pure Column
   expression, monotone in the key under Spark's own ordering (count-of-
   smaller-boundaries is independent of boundary enumeration order, so a
   Python/Spark collation mismatch can skew balance but never correctness).

Evaluating the plan twice, with or without caching, under any partitioning,
yields identical buckets and therefore identical prefix sums.

Scale shape: the driver holds only the sample (~``num_buckets * 64`` keys)
and the boundary literals; everything else is JVM-side codegen.  The two
extra actions scan one projected column — at 100 TB that is a
column-pruned parquet scan, the same price ``repartitionByRange`` paid
internally for its own (non-reusable, nondeterministic) sampling pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_boundaries(df: DataFrame, key: Column | str,
                     num_buckets: int | None = None,
                     sample_per_bucket: int = 64) -> list:
    """Sorted boundary keys splitting ``key``'s value range into at most
    ``num_buckets`` roughly equal buckets.  Deterministic for a given
    dataset: the sample is the ``num_buckets * sample_per_bucket`` rows
    with the SMALLEST ``(xxhash64(key), key)`` — a bottom-k uniform
    sample that is a pure function of the value set (hash ties broken
    by the key itself).  Returns ``[]`` when the data is empty or tiny
    (single bucket — correct, just unparallel).

    One driver action (TakeOrdered), driver memory bounded by the
    sample size.  (r15: the previous scheme — count the table, then
    collect rows where ``hash % m == 0`` — was equally deterministic
    but cost TWO full-scan jobs per call; at sub-second benchmark
    scale those scheduler round-trips dominated the queries built on
    this, see FLOOR_MODEL_r15.json.)"""
    key = F.col(key) if isinstance(key, str) else key
    if num_buckets is None:
        num_buckets = int(df.sparkSession.conf.get(
            "spark.sql.shuffle.partitions", "200"))
    if num_buckets <= 1:
        return []
    keyed = df.select(key.alias("_k")).where(F.col("_k").isNotNull())
    target = num_buckets * sample_per_bucket
    sample = sorted(r["_k"] for r in
                    keyed.select("_k", F.xxhash64("_k").alias("_h"))
                    .orderBy("_h", "_k").limit(target).collect())
    if len(sample) < 2:
        return []
    bounds = []
    for i in range(1, num_buckets):
        b = sample[min(len(sample) - 1, len(sample) * i // num_buckets)]
        if not bounds or b != bounds[-1]:
            bounds.append(b)
    return bounds


def bucket_of(key: Column | str, boundaries: list) -> Column:
    """Bucket id for ``key`` given sorted ``boundaries``: the number of
    boundaries strictly below the key (ties land in the lower bucket, so
    equal keys always share a bucket).  NULL keys map to bucket 0.  Pure
    whole-stage-codegen arithmetic — no shuffle, no runtime state."""
    key = F.col(key) if isinstance(key, str) else key
    pid = F.lit(0)
    for b in boundaries:
        pid = pid + F.when(key > F.lit(b), 1).otherwise(0)
    return pid.cast("int")


def deterministic_buckets(df: DataFrame, key: Column | str,
                          num_buckets: int | None = None) -> Column:
    """Convenience: ``bucket_of(key, range_boundaries(df, key))``."""
    return bucket_of(key, range_boundaries(df, key, num_buckets))
