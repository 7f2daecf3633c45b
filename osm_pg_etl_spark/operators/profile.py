"""Table/column statistics — the computed answer to the reference's
hand-set planner stats (SURVEY §1.4, §2.1 S10).

The reference hard-codes ``n_distinct`` overrides because "Postgres gets
horrible counts of distinct values by sampling random pages"
(``etl/pgsnapshot_schema_0.6.sql:146-170``). Spark-side the same numbers
are one exact single-pass aggregation away; ``table_profile`` computes
them (plus null rates and min/max) so the ratios the reference sets by
hand — e.g. way_nodes.way_id n_distinct = -0.08 ≙ |ways|/|way_nodes| —
can be derived from data instead of June-2013 folklore. Feed the output
to ``ANALYZE TABLE … COMPUTE STATISTICS FOR COLUMNS`` equivalents or a
broadcast-vs-shuffle planning decision.

Scale shape: ONE pass over the table — every per-column statistic is an
aggregate expression in the same Aggregate node (count/min/max/null are
map-side-combinable; distinct counts use HLL ``approx_count_distinct``
so the pass stays fixed-memory at any width). ``exact_distinct=True``
switches to exact ``count_distinct`` — one expand + shuffle, for when
the profile feeds a correctness decision rather than a planner hint.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_profile(df: DataFrame, columns: Sequence[str] | None = None,
                  exact_distinct: bool = False) -> DataFrame:
    """One row per profiled column: ``(column, n_rows, n_nulls, null_frac,
    n_distinct, distinct_ratio, min_repr, max_repr)``. ``distinct_ratio``
    is the pgsnapshot-convention negative fraction when distincts scale
    with the table (n_distinct/n_rows), mirroring how the reference's
    ``SET (n_distinct = -0.08)`` overrides are expressed."""
    cols = list(columns) if columns is not None else df.columns
    n = F.count(F.lit(1))
    aggs = [n.alias("_n")]
    for c in cols:
        col = F.col(c)
        nd = (F.count_distinct(col) if exact_distinct
              else F.approx_count_distinct(col))
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"_null_{c}"),
            nd.alias(f"_nd_{c}"),
            F.min(col.cast("string")).alias(f"_min_{c}"),
            F.max(col.cast("string")).alias(f"_max_{c}"),
        ]
    row = df.agg(*aggs).first()
    n_rows = int(row["_n"])
    out = []
    for c in cols:
        nulls, nd = int(row[f"_null_{c}"]), int(row[f"_nd_{c}"])
        out.append((
            c, n_rows, nulls,
            round(nulls / n_rows, 6) if n_rows else 0.0,
            nd,
            round(-nd / n_rows, 6) if n_rows else 0.0,
            row[f"_min_{c}"], row[f"_max_{c}"]))
    return df.sparkSession.createDataFrame(
        out, "column string, n_rows long, n_nulls long, null_frac double, "
             "n_distinct long, distinct_ratio double, "
             "min_repr string, max_repr string")


def key_skew_report(df: DataFrame, key_col: str, top: int = 10,
                    exact_distinct: bool = False) -> DataFrame:
    """Heavy-hitter diagnosis for a join/group key: the ``top`` most
    frequent values with their share of the table and the skew factor
    (share × n_distinct — 1.0 means perfectly uniform). The number that
    tells you whether to reach for ``salted_join``/``salted_count_sum``
    before the 100× run, computed with two small aggregations."""
    nd_agg = (F.count_distinct(F.col(key_col)) if exact_distinct
              else F.approx_count_distinct(key_col))
    n_row = df.agg(F.count(F.lit(1)).alias("n"),
                   nd_agg.alias("nd")).first()
    n, nd = int(n_row["n"]), max(1, int(n_row["nd"]))
    return (df.groupBy(F.col(key_col).cast("string").alias("key"))
            .agg(F.count(F.lit(1)).alias("count"))
            .orderBy(F.desc("count"), "key").limit(top)
            .select("key", "count",
                    F.round(F.col("count") / n, 6).alias("share"),
                    F.round(F.col("count") / n * nd, 2).alias("skew_factor")))
