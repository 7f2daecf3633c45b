"""rollup_counts scan-vs-agg breakdown (r14, VERDICT task 1).

The r13 K-replica study pinned the residual rollup_counts gap to a ~3x
marginal per-row constant (SCALING.md: K=100->200 slope ~15.6 ms/M rows
Spark vs ~4.8 ms/M DuckDB). This probe separates SCAN from AGG so the
residual is attributed, not argued:

  scan  = global (ungrouped) aggregate over the SAME 3-column parquet
          projection, long accumulator, no group keys: pure
          vectorized-read + per-row accumulate + job floor.
  full  = the shipped rollup_counts plan (fixed_point_presum ->
          rollup_agg leaf re-aggregation) / GROUP BY ROLLUP in DuckDB.

Both engines read the SAME materialized parquet (K concatenated copies
of sf0.1 lineitem's (l_returnflag, l_linestatus, l_quantity)), so the
file-format leg is identical. Measurements are interleaved
S-scan/D-scan/S-full/D-full per rep (see memory: sequential blocks lie),
drained via noop sink / .arrow(), trimmed medians over REPS reps.

Usage: python scripts/rollup_breakdown.py [K] [REPS]   (default 200 5)
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

import duckdb
from pyspark.sql import functions as F

from osm_pg_etl_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"


def materialize(spark, k: int) -> str:
    path = f"/tmp/rollup_breakdown_k{k}.parquet"
    import os
    if os.path.exists(path + "/_SUCCESS"):
        return path
    li = (spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
          .select("l_returnflag", "l_linestatus", "l_quantity"))
    copies = li
    for _ in range(k - 1):
        copies = copies.unionByName(li)
    # repartition so the file layout is a normal multi-file parquet table,
    # not 200 tiny row-groups per input split
    copies.repartition(32).write.mode("overwrite").parquet(path)
    return path


def spark_scan(spark, path: str) -> None:
    # same half-adjust scaled-long expression fixed_point_presum ships
    # (r14) so scan-vs-full is a true decomposition of the gate's plan
    sd = F.col("l_quantity") * F.lit(1e6)
    scaled = (sd + F.when(sd >= 0, F.lit(0.5))
              .otherwise(F.lit(-0.5))).cast("long")
    df = spark.read.parquet(path).agg(
        F.count("l_returnflag").alias("c1"),
        F.count("l_linestatus").alias("c2"),
        F.sum(scaled).alias("s"))
    df.write.format("noop").mode("overwrite").save()


def spark_full(spark, path: str) -> None:
    from osm_pg_etl_spark.operators.rollup import (
        fixed_point_presum, rollup_agg)
    li = spark.read.parquet(path)
    keys = ["l_returnflag", "l_linestatus"]
    fact = fixed_point_presum(li, keys, "l_quantity")
    out = rollup_agg(
        fact, keys,
        {"n": (F.coalesce(F.sum("_n"), F.lit(0).cast("bigint")), "count"),
         "_s": (F.sum("_q"), "sum")})
    out = out.select(
        "l_returnflag", "l_linestatus",
        F.col("g_l_returnflag").alias("g_flag"),
        F.col("g_l_linestatus").alias("g_status"),
        "n", F.round(F.col("_s").cast("double"), 4).alias("sum_qty"))
    out.write.format("noop").mode("overwrite").save()


DUCK_SCAN = """
SELECT COUNT(l_returnflag) AS c1, COUNT(l_linestatus) AS c2,
       CAST(SUM(CAST(ROUND(l_quantity * 1e6) AS BIGINT)) AS BIGINT) AS s
FROM read_parquet('{path}/*.parquet')
"""

DUCK_FULL = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST((l_quantity) AS DECIMAL(28,6))) AS DOUBLE), 4)
         AS sum_qty
FROM read_parquet('{path}/*.parquet')
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def trimmed_median(xs: list[float]) -> float:
    xs = sorted(xs)
    if len(xs) >= 4:
        xs = xs[1:-1]
    return statistics.median(xs)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark()
    path = materialize(spark, k)
    con = duckdb.connect()
    con.execute(f"SET threads={spark.sparkContext.defaultParallelism}")

    def d_scan():
        con.execute(DUCK_SCAN.format(path=path)).arrow()

    def d_full():
        con.execute(DUCK_FULL.format(path=path)).arrow()

    # warm both engines once (JIT/codegen/file-footer caches)
    spark_scan(spark, path); d_scan()
    spark_full(spark, path); d_full()

    res: dict[str, list[float]] = {"s_scan": [], "d_scan": [],
                                   "s_full": [], "d_full": []}
    for r in range(reps):
        res["s_scan"].append(timed(lambda: spark_scan(spark, path)))
        res["d_scan"].append(timed(d_scan))
        res["s_full"].append(timed(lambda: spark_full(spark, path)))
        res["d_full"].append(timed(d_full))
        print(f"rep {r}: " + "  ".join(
            f"{k2}={v[-1]:.3f}s" for k2, v in res.items()), flush=True)

    med = {k2: trimmed_median(v) for k2, v in res.items()}
    out = {
        "k": k, "rows_m": round(k * 0.6, 1), "reps": reps,
        "spark_scan_s": round(med["s_scan"], 3),
        "duck_scan_s": round(med["d_scan"], 3),
        "spark_full_s": round(med["s_full"], 3),
        "duck_full_s": round(med["d_full"], 3),
        "scan_ratio": round(med["s_scan"] / med["d_scan"], 2),
        "full_ratio": round(med["s_full"] / med["d_full"], 2),
        "spark_agg_delta_s": round(med["s_full"] - med["s_scan"], 3),
        "duck_agg_delta_s": round(med["d_full"] - med["d_scan"], 3),
        "spreads": {k2: [round(x, 3) for x in sorted(v)]
                    for k2, v in res.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
