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
    for _ in range(2):
        for name in HEADLINE:
            queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            con.execute(oracles[name]).fetchall()
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
    for _ in range(repeats):
        spark.catalog.clearCache()
        s_one: dict[str, float] = {}
        d_one: dict[str, float] = {}
        for name in HEADLINE:
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            s_one[name] = time.perf_counter() - t0
            t0 = time.perf_counter()
            con.execute(oracles[name]).fetchall()
            d_one[name] = time.perf_counter() - t0
        s_passes.append(s_one)
        d_passes.append(d_one)

    def med(ps, name):
        return statistics.median(p[name] for p in ps)

    def spr(ps, name):
        return max(p[name] for p in ps) - min(p[name] for p in ps)

    tot_s = tot_d = 0.0
    per_query: dict[str, dict[str, float]] = {}
    print(f"{'query':<22}{'spark_s':>9}{'duckdb_s':>9}{'ratio':>7}"
          f"{'s_spread':>9}{'d_spread':>9}")
    for name in HEADLINE:
        s, d = med(s_passes, name), med(d_passes, name)
        tot_s += s
        tot_d += d
        per_query[name] = {"spark_s": round(s, 3), "duckdb_s": round(d, 3),
                           "ratio": round(s / d, 2),
                           "spark_spread_s": round(spr(s_passes, name), 3),
                           "duckdb_spread_s": round(spr(d_passes, name), 3)}
        print(f"{name:<22}{s:>9.2f}{d:>9.2f}{s / d:>7.1f}"
              f"{spr(s_passes, name):>9.2f}{spr(d_passes, name):>9.2f}")
    print(f"{'TOTAL':<22}{tot_s:>9.2f}{tot_d:>9.2f}{tot_s / tot_d:>7.1f}")
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCHCMP.json"
    with open(out_path, "w") as f:
        json.dump({"sf_dir": sf_dir,
                   "warm": True,
                   "repeats": repeats,
                   "total_spark_s": round(tot_s, 3),
                   "total_duckdb_s": round(tot_d, 3),
                   "ratio": round(tot_s / tot_d, 3),
                   "queries": per_query}, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
