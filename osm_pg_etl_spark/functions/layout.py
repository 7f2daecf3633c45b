"""Multi-column data layout — the OPTIMIZE ZORDER analog.

At 100 TB the cheapest query is the one that never reads a file: parquet
min/max footers prune files only if values are clustered, and a single
sort key clusters one column at the expense of all others. Z-ordering
interleaves the bits of several (quantized) columns into one sort key so
every participating column stays range-clustered, multiplying footer
pruning for multi-predicate scans — the same trick Delta's OPTIMIZE
ZORDER BY and Iceberg's sort orders apply.

Everything here is pure Column arithmetic (whole-stage codegen), and the
quantization derives from table min/max statistics — layout is a pure
function of the data, never of the runtime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def z_value(cols: list[Column | str], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each column (Morton code): bit
    ``i`` of column ``j`` lands at position ``i * len(cols) + j``. Inputs
    must already be small non-negative integers (quantized levels);
    ``bits * len(cols)`` must fit a signed long."""
    cols = [F.col(c) if isinstance(c, str) else c for c in cols]
    if bits * len(cols) > 62:
        raise ValueError(f"{bits} bits x {len(cols)} cols exceeds a long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * len(cols) + j)
    return z


def zorder_sort(df: DataFrame, cols: list[str], bits: int = 12,
                num_partitions: int | None = None) -> DataFrame:
    """Return ``df`` re-ordered by the Z-value of ``cols``: each numeric
    column is linearly quantized to ``2^bits`` levels between its min and
    max (ONE stats pass for all columns, O(1) codegen per row — a
    rank-equidistributed quantization at this many levels would need
    thousands of boundary comparisons per row), the levels are
    bit-interleaved, and rows are range-partitioned + sorted by the code.
    Write the result plain and every ``cols`` predicate prunes files by
    parquet footer. NULLs sort to level 0.

    Skew caveat: linear quantization wastes levels when a column is
    heavily skewed toward one end of its range — pre-transform (log, or a
    coarse ``partitioning.bucket_of`` level with ≤ 2^8 buckets) if file
    pruning on that column matters.

    Cost: one stats pass plus one range exchange — the price of any
    layout rewrite; do it in the same job as a compaction."""
    m = 1 << bits
    stats = df.agg(*(
        [F.min(F.col(c).cast("double")).alias(f"_mn_{c}") for c in cols]
        + [F.max(F.col(c).cast("double")).alias(f"_mx_{c}") for c in cols]
    )).first()
    levels = []
    for c in cols:
        mn = stats[f"_mn_{c}"] or 0.0
        mx = stats[f"_mx_{c}"] or 0.0
        span = (mx - mn) or 1.0
        lvl = F.floor((F.col(c).cast("double") - F.lit(mn))
                      / F.lit(span) * F.lit(m - 1)).cast("long")
        levels.append(F.coalesce(
            F.least(F.lit(m - 1).cast("long"),
                    F.greatest(F.lit(0).cast("long"), lvl)),
            F.lit(0).cast("long")))
    out = df.withColumn("_z", z_value(levels, bits))
    parts = [num_partitions] if num_partitions else []
    return (out.repartitionByRange(*parts, F.col("_z"))
            .sortWithinPartitions("_z")
            .drop("_z"))
