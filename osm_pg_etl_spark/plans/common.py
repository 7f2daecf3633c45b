"""Shared helpers for the query registry.

Float discipline for oracle comparability (the driver hash-compares values
against DuckDB): raw double SUMs over 10^4+ rows differ across engines in
the low bits, so every summed measure is cast to DECIMAL before aggregation
(exact arithmetic in both engines), cast back to double, and rounded. The
same expression pattern appears verbatim in each oracle's SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import read_testdata


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_testdata(spark, sf_dir, name)


def dsum(c: Column | str, scale: int = 4) -> Column:
    """Engine-portable exact sum: decimal-sum → double → round."""
    col = F.col(c) if isinstance(c, str) else c
    return F.round(F.sum(col.cast("decimal(28,6)")).cast("double"), scale)


def davg(c: Column | str, scale: int = 6) -> Column:
    """Engine-portable average: decimal mean (exact) → double → round."""
    col = F.col(c) if isinstance(c, str) else c
    return F.round(
        (F.sum(col.cast("decimal(28,6)")) / F.count(col)).cast("double"), scale)


def sql_dsum(expr: str, scale: int = 4) -> str:
    return f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(28,6))) AS DOUBLE), {scale})"


def sql_davg(expr: str, scale: int = 6) -> str:
    return (f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(28,6))) "
            f"/ COUNT({expr}) AS DOUBLE), {scale})")
