"""Re-aggregated ROLLUP / CUBE / GROUPING SETS for algebraic measures.

Spark compiles ``df.rollup(...)`` / ``df.cube(...)`` to an ``Expand``
node that replicates EVERY fact row once per grouping level before the
partial aggregate — a 2-key rollup pushes 3x the rows (a cube 4x)
through the aggregation pipeline, and the multiplier lands on the most
expensive part of the plan (here, exact DECIMAL accumulation). That is
the right plan only when a measure is NOT re-aggregable (e.g. COUNT
DISTINCT). For algebraic measures (count/sum/min/max, and avg via
sum+count) the subtotal levels are derivable from the LEAF aggregate,
which is group-cardinality-sized, not fact-table-sized:

    leaf   = one groupBy over the facts   (single full-data shuffle,
                                           map-side partial agg)
    levels = re-aggregations OF THE LEAF  (tiny — |distinct groups| rows)

At 100 TB the difference is stark: Expand makes the fact-table pass
L times heavier (L = number of levels), while re-aggregation keeps one
fact pass and adds L-1 jobs over a few thousand leaf rows. Measured at
sf0.1 (`/tmp/prof_rollup.py`, 5 interleaved passes): Expand-rollup
0.894 s median vs re-aggregated 0.563 s with the decimal measure —
and the gap scales with the level count and measure width.

Semantics match SQL ROLLUP/CUBE exactly, including the GROUPING()
markers: subtotal rows carry NULL key values plus g_<key>=1, and data
NULLs in key columns stay distinguishable (g_<key>=0) just as
``GROUPING()`` guarantees in PostgreSQL (the reference engine) and
DuckDB (the oracle).

Reference parity: the reference's summary tables (osm-explore.sql:5-52)
are plain GROUP BYs; rollup here extends them the way a PostgreSQL user
would write GROUP BY ROLLUP — this module keeps that surface while
fixing the Spark plan shape.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["rollup_agg", "cube_agg", "grouping_sets_agg",
           "fixed_point_presum"]


def fixed_point_presum(df: DataFrame, keys: Sequence[str],
                       value_col: Column | str, scale: int = 6,
                       n_name: str = "_n",
                       sum_name: str = "_q") -> DataFrame:
    """Exact-decimal SUM at integer speed (r13): pre-aggregate the fact
    table per (input partition, keys) with the measure summed as a
    SCALED LONG, then rescale to decimal only on the tiny partials.

    The per-row ``cast(decimal(28,6))`` in a plain dsum leaf is the
    dominant cost of the whole rollup at scale (measured 1.18 s vs
    0.47 s for the long path on 30 M rows — 2.5x on the aggregation);
    this keeps the hot loop in packed longs and pays BigDecimal cost on
    |partitions| x |groups| rows. The ``spark_partition_id`` grouping
    bounds each long partial by rows-per-partition x max_scaled_value,
    so the exactness contract survives any corpus size (a single global
    long sum could overflow at ~2e11 rows of scale-6 values; a 128 MB
    partition cannot) — the same partial-in-int/finish-in-wide shape
    production money pipelines use.

    Precondition: every value is exactly representable with ``scale``
    fractional decimal digits (fixed-point data carried as double —
    quantities, prices). NULL measures are skipped, like SUM.

    Returns keys + ``n_name`` (row count, bigint) + ``sum_name``
    (decimal(28,6)); re-aggregating with (sum of n, sum of q) is
    exactly (COUNT(*), dsum(value)) over ``df`` — feed it to
    :func:`rollup_agg` / :func:`cube_agg` as the fact table."""
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    # HALF_UP via sign-aware half-adjust + truncating cast, NOT F.round:
    # Spark's Round on DoubleType allocates a BigDecimal per row, which
    # put the exact cost this function exists to avoid right back in the
    # hot loop (measured r14: 1.48 s vs 0.33 s on a 120 M-row pass).
    # Identical results for |value * 10^scale| < 2^52: cast truncates
    # toward zero, so +-0.5 reproduces HALF_UP's away-from-zero ties;
    # representation error (~1e-9 relative) cannot cross an integer
    # boundary because scale-exact inputs scale to integers. Divergence
    # band, stated precisely: for |scaled| in [2^52, 2^53) one double
    # ulp is 1.0, so scaled + 0.5 is a tie the FPU resolves to-even —
    # an ODD integer-valued scaled double comes back as value + 1 where
    # F.round(double) returns it unchanged. That band is ~4.5e9 units
    # above this function's documented 2^53 exactness ceiling headroom
    # (scale-6 values >= ~4.5e9 absolute); callers at such magnitudes
    # must pre-cast to decimal and use plain SUM instead — the double
    # MULTIPLY by 10^scale is already inexact there, for this path and
    # for round(double) alike.
    scaled_d = c * F.lit(float(10 ** scale))
    scaled = (scaled_d + F.when(scaled_d >= 0, F.lit(0.5))
              .otherwise(F.lit(-0.5))).cast("long")
    pre = df.groupBy(F.spark_partition_id().alias("_pid"), *keys).agg(
        F.count(F.lit(1)).alias(n_name), F.sum(scaled).alias("_ls"))
    return pre.select(
        *keys, n_name,
        (F.col("_ls").cast("decimal(38,0)") / F.lit(10 ** scale))
        .cast("decimal(28,6)").alias(sum_name))

# leaf aggregate -> how the subtotal levels re-aggregate it. "count" is
# sum-of-counts but NULL-safe for the empty-input grand total: GROUP BY
# GROUPING SETS (()) over zero rows still emits one row with COUNT = 0,
# and SUM over the then-empty leaf would return NULL instead.
_MERGES = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "count": lambda c: F.coalesce(F.sum(c), F.lit(0).cast("bigint")),
}


def _levels_rollup(keys: Sequence[str]) -> list[tuple[str, ...]]:
    return [tuple(keys[:i]) for i in range(len(keys), -1, -1)]


def _levels_cube(keys: Sequence[str]) -> list[tuple[str, ...]]:
    out = []
    for mask in range(2 ** len(keys) - 1, -1, -1):
        out.append(tuple(k for i, k in enumerate(keys)
                         if mask & (1 << (len(keys) - 1 - i))))
    return out


def grouping_sets_agg(
    df: DataFrame,
    keys: Sequence[str],
    measures: dict[str, tuple[Column, str]],
    sets: Sequence[Sequence[str]],
    grouping_prefix: str = "g_",
) -> DataFrame:
    """GROUPING SETS via leaf re-aggregation.

    ``measures`` maps output name -> (leaf aggregate Column, merge kind in
    {"sum", "min", "max", "count"}); a COUNT measure is
    ``(F.count(...), "count")``.
    Every requested set must be a subset of ``keys`` (the leaf). Output
    carries one ``g_<key>`` INT marker per key, exactly like GROUPING().
    """
    keys = list(keys)
    key_set = set(keys)
    for s in sets:
        if not set(s) <= key_set:
            raise ValueError(f"grouping set {s!r} not a subset of {keys!r}")

    leaf = df.groupBy(*keys).agg(
        *[agg.alias(name) for name, (agg, _) in measures.items()])
    # The leaf is tiny (|distinct key combos| rows) but feeds every level;
    # without this it would recompute the fact-table pass per level.
    leaf = leaf.localCheckpoint(eager=False)
    key_types = dict(leaf.dtypes)

    pieces = []
    for lvl in sets:
        lvl = tuple(lvl)
        if set(lvl) == key_set:
            base = leaf
        else:
            merges = [_MERGES[kind](name).alias(name)
                      for name, (_, kind) in measures.items()]
            base = (leaf.groupBy(*lvl).agg(*merges) if lvl
                    else leaf.agg(*merges))
        cols = []
        for k in keys:
            if k in lvl:
                cols.append(F.col(k))
            else:
                cols.append(F.lit(None).cast(key_types[k]).alias(k))
        for k in keys:
            cols.append(F.lit(0 if k in lvl else 1)
                        .cast("int").alias(f"{grouping_prefix}{k}"))
        cols += [F.col(name) for name in measures]
        pieces.append(base.select(*cols))
    return reduce(lambda a, b: a.unionByName(b), pieces)


def rollup_agg(df: DataFrame, keys: Sequence[str],
               measures: dict[str, tuple[Column, str]],
               grouping_prefix: str = "g_") -> DataFrame:
    """ROLLUP(keys) with algebraic measures, one fact-table pass."""
    return grouping_sets_agg(df, keys, measures, _levels_rollup(keys),
                             grouping_prefix)


def cube_agg(df: DataFrame, keys: Sequence[str],
             measures: dict[str, tuple[Column, str]],
             grouping_prefix: str = "g_") -> DataFrame:
    """CUBE(keys) with algebraic measures, one fact-table pass."""
    return grouping_sets_agg(df, keys, measures, _levels_cube(keys),
                             grouping_prefix)
