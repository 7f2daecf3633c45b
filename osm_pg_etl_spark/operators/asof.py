"""As-of (point-in-time) join — attach to each left row the most recent
right row at or before it, per key.

The feature-store / market-data staple the reference's engine family ships
as a dedicated operator.  The naive formulation is a range join
(``r.ts <= l.ts`` + argmax), which explodes to O(|L|·|R|) candidates per
key before the argmax prunes them.  The scalable Spark formulation used
here is the *union trick*:

1. tag right rows ``m=0`` and left rows ``m=1``, union them aligned on
   (key, ts, tie-break id) with the other side's payload columns nulled;
2. one window per key ordered by (ts, m, id):
   ``last(right_payload, ignoreNulls=True)`` over UNBOUNDED PRECEDING;
3. keep only left rows — each now carries the latest right payload with
   ``right.ts <= left.ts`` (ties included, right-before-left at equal ts).

One exchange on the key, one in-partition sort, zero joins — the plan a
100-TB feature-backfill needs.  Ties inside the right side at identical
(key, ts) resolve deterministically to the greatest ``right_id``.

``tolerance`` (seconds) optionally voids matches older than
``left.ts - tolerance`` — the "don't join features staler than an hour"
guard — applied as a post-filter on the matched timestamp, which keeps the
single-pass shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              left_id: str = "event_id", right_id: str = "event_id",
              right_payload: tuple[str, ...] = ("value",),
              tolerance_s: float | None = None) -> DataFrame:
    """For each left row: the most recent right row with
    ``right_ts <= left_ts`` on the same ``on`` key (backward as-of,
    inclusive).  Returns the left (on, left_id, left_ts) plus
    ``asof_<right_id>``, ``asof_ts``, ``asof_<payload>...`` columns —
    NULL where no prior right row exists (left outer semantics).
    """
    rp = [f"asof_{c}" for c in right_payload]
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_m"),
        F.col(right_id).alias("_ord"),
        F.col(right_id).alias(f"asof_{right_id}"),
        F.col(right_ts).alias("asof_ts"),
        *[F.col(c).alias(a) for c, a in zip(right_payload, rp)],
        F.lit(None).cast("long").alias("_lid"),
        F.lit(None).cast(left.schema[left_ts].dataType.simpleString())
         .alias("_lts"),
    )
    lf = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_m"),
        F.col(left_id).alias("_ord"),
        F.lit(None).cast(right.schema[right_id].dataType.simpleString())
         .alias(f"asof_{right_id}"),
        F.lit(None).cast(right.schema[right_ts].dataType.simpleString())
         .alias("asof_ts"),
        *[F.lit(None).cast(right.schema[c].dataType.simpleString()).alias(a)
          for c, a in zip(right_payload, rp)],
        F.col(left_id).alias("_lid"),
        F.col(left_ts).alias("_lts"),
    )
    # right rows sort before left rows at equal ts (_m 0 < 1): backward
    # as-of is inclusive of same-timestamp right rows.
    w = (Window.partitionBy("_k").orderBy("_ts", "_m", "_ord")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = [F.last(c, ignorenulls=True).over(w).alias(c)
               for c in (f"asof_{right_id}", "asof_ts", *rp)]
    out = (r.unionByName(lf)
           .select("_k", "_m", "_lid", "_lts", *carried)
           .filter(F.col("_m") == 1)
           .select(F.col("_k").alias(on),
                   F.col("_lid").alias(left_id),
                   F.col("_lts").alias(left_ts),
                   f"asof_{right_id}", "asof_ts", *rp))
    if tolerance_s is not None:
        stale = (F.col(left_ts).cast("double")
                 - F.col("asof_ts").cast("double")) > F.lit(tolerance_s)
        null_cols = {c: F.when(stale, F.lit(None)).otherwise(F.col(c))
                     for c in (f"asof_{right_id}", "asof_ts", *rp)}
        out = out.withColumns(null_cols)
    return out
