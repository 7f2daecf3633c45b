"""Skew-handling utilities.

AQE's skew-join splitting (enabled in session.py) covers joins; for
aggregations whose group key is pathologically hot (a handful of keys
holding most rows — the shape of OSM tag values like highway=residential),
two-phase salted aggregation keeps every reducer bounded:

1. phase 1 groups by (key, salt) where salt = crc32(row-unique col) % B —
   map-side partial aggregation still applies, and no reducer sees more
   than ~1/B of a hot key's rows;
2. phase 2 re-aggregates the B partials per key (B rows per key, trivial).

The decomposition requires an algebraic aggregate (count/sum/min/max —
their partials combine associatively). The result is identical to the
direct groupBy, which is exactly what the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, entropy_col: str | Column,
              buckets: int = 16, salt_col: str = "_salt") -> DataFrame:
    """Attach a deterministic salt in [0, buckets) derived from an existing
    high-entropy column (no rand(): results stay reproducible and
    retry-safe)."""
    c = F.col(entropy_col) if isinstance(entropy_col, str) else entropy_col
    return df.withColumn(
        salt_col, F.pmod(F.crc32(c.cast("string")), F.lit(buckets)))


def salted_count_sum(df: DataFrame, key_cols: list[str], sum_col: str,
                     entropy_col: str, buckets: int = 16) -> DataFrame:
    """groupBy(key).agg(count, sum) computed skew-safely in two phases.
    Identical result to the direct aggregation (oracle-checked); use when a
    key's row count exceeds what one reducer partition should hold."""
    salted = with_salt(df, entropy_col, buckets)
    partial = (salted.groupBy(*key_cols, "_salt")
               .agg(F.count(F.lit(1)).alias("_n"),
                    F.sum(F.col(sum_col).cast("decimal(28,6)")).alias("_s")))
    return (partial.groupBy(*key_cols)
            .agg(F.sum("_n").alias("n_rows"),
                 F.sum("_s").alias("_s2"))
            .select(*key_cols, "n_rows",
                    F.round(F.col("_s2").cast("double"), 4).alias("sum_value")))


def salted_join(big: DataFrame, small: DataFrame, key: str,
                entropy_col: str, buckets: int = 16,
                how: str = "inner") -> DataFrame:
    """Equi-join with the hot-key salting AQE cannot apply: the big side
    gets a deterministic salt from one of its own high-entropy columns,
    the small side is replicated ``buckets`` times, and the join runs on
    (key, salt) — no reducer sees more than ~1/B of a hot key's rows even
    when ONE key dominates the whole table (AQE's skew split only kicks in
    per sort-merge partition and cannot split a broadcast build side that
    doesn't fit memory).

    Result is row-identical to ``big.join(small, key, how)`` — the salt is
    an internal partitioning detail (oracle-checked). ``how`` supports
    inner/left. Cost: the small side shuffles B× larger, the price of
    bounded reducers.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    salted = with_salt(big, entropy_col, buckets)
    replicated = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(b) for b in range(buckets)])))
    out = salted.join(replicated, [key, "_salt"], how)
    return out.drop("_salt")
