"""Side-by-side wall-clock: our Spark queries vs DuckDB running the
equivalent oracle SQL on the same parquet files, at the bench scale factor.

This is the honest local stand-in for BASELINE.md (the reference publishes
no query timings): DuckDB is a strong single-node columnar engine, so
matching it on a single box while every stage stays shuffle-partitioned is
the "fast locally, scales horizontally" evidence.

Usage: python scripts/bench_compare.py [sf_dir] [out.json]

Besides the table on stdout, results are persisted as a JSON artifact
(default ``BENCHCMP.json``) so the ratio cited in round docs is
reproducible from the repo instead of a transcript claim.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

import duckdb

from bench import HEADLINE
from osm_pg_etl_spark.session import get_spark

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from osm_pg_etl_spark.plans.registry import all_oracles, all_queries
    from osm_pg_etl_spark.sources.io import read_testdata

    spark = get_spark(app_name="bench-compare")
    spark.sparkContext.setLogLevel("ERROR")
    queries, oracles = all_queries(), all_oracles()

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
            read_testdata(spark, sf_dir, t).count()  # warm both engines

    # Symmetric untimed warm passes (same methodology as bench.py): Spark's
    # first executions pay codegen + tiered C2 JIT (2-3x on big plans),
    # DuckDB's warm the buffer pool; the timed loop below compares
    # steady-state engines. Spark's cached intermediates are dropped so the
    # timed queries rebuild them.
    # job-floor probe (r13, VERDICT task 3): a SELECT-1-shaped no-op
    # through the exact same harness path as every timed query — one
    # Spark job to the noop sink vs one DuckDB statement — so the JSON
    # carries the fixed per-query overhead each engine pays regardless
    # of data. At sf0.1 most queries are sub-second; the RAW ratio then
    # compares Spark's scheduler floor to DuckDB's ~0 in-process floor,
    # and the floor-adjusted ratio is the data-work comparison.
    def run_spark_floor() -> None:
        spark.range(1).selectExpr("1 AS x").write.format("noop") \
            .mode("overwrite").save()

    def run_duck_floor() -> None:
        con.execute("SELECT 1 AS x").arrow()

    # second probe: one exchange (a 1-row groupBy), since every real
    # query here is multi-stage — the spread between the two probes is
    # the per-shuffle-stage scheduling increment
    def run_spark_floor_shuffle() -> None:
        spark.range(1).groupBy("id").count().write.format("noop") \
            .mode("overwrite").save()

    def run_duck_floor_shuffle() -> None:
        con.execute("SELECT 1 AS x, COUNT(*) FROM (SELECT 1) GROUP BY 1") \
            .arrow()

    for _ in range(2):
        for name in HEADLINE:
            queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            con.execute(oracles[name]).arrow()
        run_spark_floor()
        run_duck_floor()
        spark.catalog.clearCache()

    # Median-of-R timed passes per engine (default 3; single-shot spread
    # reached 50% on sub-2 s queries — r5 verdict #2), whole-set replay
    # per pass with a clearCache so intra-pass cache sharing matches the
    # historical methodology; per-query median is reported, max-min the
    # recorded spread, so round-over-round diffs are signal.
    import statistics

    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    s_passes: list[dict[str, float]] = []
    d_passes: list[dict[str, float]] = []
    s_floors: list[float] = []
    d_floors: list[float] = []
    s_floors_sh: list[float] = []
    d_floors_sh: list[float] = []
    for r in range(repeats):
        spark.catalog.clearCache()
        s_one: dict[str, float] = {}
        d_one: dict[str, float] = {}
        # r14 (verdict task 7): rotate the query order per pass so no
        # entry systematically inherits a predecessor's JVM heap state
        # (SCALING.md's tfidf-after-knn_join adjacency effect taxed the
        # next query ~2.2x in a fixed order). Deterministic rotation —
        # each pass starts len/repeats further along — keeps runs
        # reproducible while the per-query MEDIAN sees different
        # neighborhoods.
        rot = (r * len(HEADLINE)) // repeats
        pass_order = list(HEADLINE)[rot:] + list(HEADLINE)[:rot]
        for name in pass_order:
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            s_one[name] = time.perf_counter() - t0
            t0 = time.perf_counter()
            con.execute(oracles[name]).arrow()
            d_one[name] = time.perf_counter() - t0
        # 3 floor probes per pass (it is itself sub-100ms-noisy)
        for _i in range(3):
            t0 = time.perf_counter()
            run_spark_floor()
            s_floors.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            run_duck_floor()
            d_floors.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            run_spark_floor_shuffle()
            s_floors_sh.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            run_duck_floor_shuffle()
            d_floors_sh.append(time.perf_counter() - t0)
        s_passes.append(s_one)
        d_passes.append(d_one)

    def med(ps, name):
        return statistics.median(p[name] for p in ps)

    def spr(ps, name):
        return max(p[name] for p in ps) - min(p[name] for p in ps)

    floor_s = statistics.median(s_floors)
    floor_d = statistics.median(d_floors)

    def adj_ratio(s: float, d: float):
        """Floor-adjusted ratio: data work only. None when a side is
        entirely floor (nothing left to compare)."""
        ds, dd = s - floor_s, d - floor_d
        if ds <= 0 or dd <= 0:
            return None
        return round(ds / dd, 2)

    tot_s = tot_d = 0.0
    per_query: dict[str, dict[str, float]] = {}
    print(f"{'query':<22}{'spark_s':>9}{'duckdb_s':>9}{'ratio':>7}"
          f"{'adj':>7}{'s_spread':>9}{'d_spread':>9}")
    for name in HEADLINE:
        s, d = med(s_passes, name), med(d_passes, name)
        tot_s += s
        tot_d += d
        ar = adj_ratio(s, d)
        per_query[name] = {"spark_s": round(s, 3), "duckdb_s": round(d, 3),
                           "ratio": round(s / d, 2),
                           "ratio_floor_adj": ar,
                           "spark_spread_s": round(spr(s_passes, name), 3),
                           "duckdb_spread_s": round(spr(d_passes, name), 3)}
        print(f"{name:<22}{s:>9.2f}{d:>9.2f}{s / d:>7.1f}"
              f"{(f'{ar:.1f}' if ar is not None else '-'):>7}"
              f"{spr(s_passes, name):>9.2f}{spr(d_passes, name):>9.2f}")
    n = len(HEADLINE)
    tot_adj = ((tot_s - n * floor_s) / (tot_d - n * floor_d)
               if tot_d - n * floor_d > 0 else None)
    print(f"{'TOTAL':<22}{tot_s:>9.2f}{tot_d:>9.2f}{tot_s / tot_d:>7.1f}"
          f"{(f'{tot_adj:.1f}' if tot_adj is not None else '-'):>7}")
    print(f"floor: spark {floor_s * 1000:.0f} ms, duckdb "
          f"{floor_d * 1000:.0f} ms per query (SELECT-1 probe); "
          f"with one shuffle stage: spark "
          f"{statistics.median(s_floors_sh) * 1000:.0f} ms, duckdb "
          f"{statistics.median(d_floors_sh) * 1000:.0f} ms "
          f"(median of {len(s_floors)})")
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCHCMP.json"
    with open(out_path, "w") as f:
        json.dump({"sf_dir": sf_dir,
                   "warm": True,
                   "repeats": repeats,
                   "order_rotation": "per-pass deterministic rotation by "
                                     "len/repeats (r14: no query "
                                     "systematically inherits one "
                                     "predecessor's JVM state)",
                   "duckdb_drain": "arrow() columnar fetch (symmetric "
                                   "with the Spark noop sink)",
                   "floor": {
                       "spark_s": round(floor_s, 4),
                       "duckdb_s": round(floor_d, 4),
                       "spark_shuffle_s":
                           round(statistics.median(s_floors_sh), 4),
                       "duckdb_shuffle_s":
                           round(statistics.median(d_floors_sh), 4),
                       "probe": "SELECT 1 through the same harness path "
                                "(Spark: 1-row job to the noop sink; "
                                "DuckDB: statement + arrow drain); the "
                                "_shuffle_ variant adds one 1-row "
                                "groupBy exchange stage; median of "
                                "3 probes x repeats",
                   },
                   "total_spark_s": round(tot_s, 3),
                   "total_duckdb_s": round(tot_d, 3),
                   "ratio": round(tot_s / tot_d, 3),
                   "ratio_floor_adj":
                       round(tot_adj, 3) if tot_adj is not None else None,
                   "queries": per_query}, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
