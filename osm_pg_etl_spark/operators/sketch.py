"""Sketch operators with engine-exact determinism.

HyperLogLog (Flajolet et al. 2007) over the md5 hash family
(:mod:`..functions.hashing`): because the register construction is a pure
function of the value bytes — not of partitioning, row order, or engine —
the DuckDB oracle re-derives the *identical* sketch, giving an approximate
distinct-count operator with a hard value-equality correctness gate
(approximate in cardinality, deterministic in computation).

Numeric portability: the register harmonic sum is kept in scaled integer
form — ``Σ 2^(maxbits+1−r)`` is a BIGINT (every term is a power of two, the
total fits 2^32 per group) — so the only floating-point steps are one final
literal/total division, which is IEEE-identical on both engines, and the
small-range ``m·ln(m/V)`` correction (rounded to 6 decimals in gates).

Scale shape: one narrow map (hash → register index/rank), one shuffle to
``(groups, register)``, one re-aggregation to ``groups`` — the same
two-level shape as a count-distinct, but with a fixed 2^p-per-group
intermediate instead of the full value set, which is the point of a sketch
at 100 TB. Register tables from disjoint corpus shards merge by
``max(rank)``: the standard mergeable-sketch property.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


def hll_registers(df: DataFrame, value_col: str,
                  group_cols: Sequence[str] = (), p: int = 10) -> DataFrame:
    """Per-group HLL register table: ``(group_cols…, _reg, _rank)`` with
    ``_reg`` the first ``p`` hash bits and ``_rank`` the max leading-zero
    rank of the remaining ``32−p`` bits. Mergeable across shards with
    ``groupBy(_reg).agg(max(_rank))``."""
    if not 4 <= p <= 20:
        raise ValueError(f"p must be in [4, 20], got {p}")
    maxbits = 32 - p
    h = md5_long(value_col)
    base = df.select(*group_cols, h.alias("_h"))
    idx = F.expr(f"_h div {1 << maxbits}").alias("_reg")
    w = F.col("_h") % (1 << maxbits)
    # bit_length(w) == length(bin(w)) for w > 0 — exact on both engines
    rank = F.when(w == 0, F.lit(maxbits + 1)) \
            .otherwise(F.lit(maxbits + 1) - F.length(F.bin(w)))
    return (base.select(*group_cols, idx, rank.alias("_r"))
            .groupBy(*group_cols, "_reg").agg(F.max("_r").alias("_rank")))


def hll_distinct(df: DataFrame, value_col: str,
                 group_cols: Sequence[str] = (), p: int = 10) -> DataFrame:
    """Approximate COUNT(DISTINCT value) per group via HyperLogLog, with
    the standard small-range linear-counting correction. Returns
    ``(group_cols…, hll_used, hll_estimate)`` where ``hll_used`` is the
    number of touched registers."""
    m = 1 << p
    maxbits = 32 - p
    scale = 1 << (maxbits + 1)
    regs = hll_registers(df, value_col, group_cols, p)
    # Σ 2^(maxbits+1-rank): exact integer harmonic sum (rank ≤ maxbits+1)
    term = F.pow(F.lit(2.0), F.lit(maxbits + 1) - F.col("_rank")) \
            .cast("long")
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("hll_used"),
        F.sum(term).alias("_s"))
    numer = _alpha(m) * m * m * scale  # exact python double literal
    total = F.col("_s") + (F.lit(m) - F.col("hll_used")) * F.lit(scale)
    raw = F.lit(numer) / total.cast("double")
    v = F.lit(m) - F.col("hll_used")  # empty registers
    est = F.when((raw <= 2.5 * m) & (v > 0),
                 m * F.log(F.lit(float(m)) / v)).otherwise(raw)
    return agg.select(*group_cols, "hll_used", est.alias("hll_estimate"))


def hll_sql(value_expr: str, group_by: str = "", p: int = 10,
            table: str = "events") -> str:
    """The DuckDB re-derivation of :func:`hll_distinct` (identical register
    math), for oracle construction."""
    m, maxbits = 1 << p, 32 - p
    scale = 1 << (maxbits + 1)
    numer = _alpha(m) * m * m * scale
    gsel = f"{group_by}, " if group_by else ""
    ggrp = f"GROUP BY {group_by}" if group_by else ""
    return f"""
regs AS (
  SELECT {gsel}reg, MAX(r) AS rank
  FROM (
    SELECT {gsel}h // {1 << maxbits} AS reg,
           CASE WHEN h % {1 << maxbits} = 0 THEN {maxbits + 1}
                ELSE {maxbits + 1} - length(bin(h % {1 << maxbits}))
           END AS r
    FROM (SELECT {gsel}('0x' || substr(md5({value_expr}), 1, 8))::BIGINT AS h
          FROM {table}))
  GROUP BY {gsel}reg),
hagg AS (
  SELECT {gsel}CAST(COUNT(*) AS BIGINT) AS hll_used,
         SUM(CAST(pow(2, {maxbits + 1} - rank) AS BIGINT)) AS s
  FROM regs {ggrp}),
hest AS (
  SELECT {gsel}hll_used,
         {numer!r} / CAST(s + ({m} - hll_used) * {scale} AS DOUBLE) AS raw,
         {m} - hll_used AS v
  FROM hagg)
"""
