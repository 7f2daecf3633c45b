"""BENCHCMP sf1 leg (r12 methodology): materialize ~sf1 parquet
(K=10 key-offset replicas of sf0.1 — disjoint regions, same topology
density) and run the DATA-BOUND query set, where sf0.1's ratios are
dominated by Spark's fixed job floor.

r12 fixes (VERDICT task 3 + ADVICE):
- 7 interleaved passes (A,B,C,...,A,B,C — never blocks) with a
  clearCache + System.gc() preamble per pass, and a TRIMMED spread
  (range of the central samples after trimming min(2,(n-3)//2) per
  side) — bench.py's exact methodology, so one GC pause or first-pass
  warm-up cannot define the spread (r11's sf1 spreads were several×
  the median for exactly that reason).
- symmetric drain: Spark writes to the noop sink (rows discarded at
  executors); DuckDB now fetches ARROW (columnar, no per-row Python
  object conversion) instead of fetchall() — recorded in the JSON as
  duckdb_drain so the ratio provenance is explicit.
- set widened to 10 data-bound gates (adds osm_directed_graph,
  minhash_neardup, dup_ngram_spans, osm_poi_nearest).

Both engines read the SAME materialized files and warm symmetrically;
per-query medians are reported. Results -> BENCHCMP_sf1.json.

Usage: python scripts/bench_sf1.py [K] [out.json]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from functools import reduce

sys.path.insert(0, ".")

import duckdb

from pyspark.sql import functions as F

from osm_pg_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "BENCHCMP_sf1.json"
DIR = f"/tmp/sf1_bench_k{K}"

# the sf0.1-data-bound set (VERDICT r10, widened r12): everything else
# in the headline set is job-floor-bound at this scale
DATA_BOUND = ["osm_merged_network", "osm_communities", "quantile_profile",
              "rollup_counts", "knn_join", "tfidf_top_terms",
              "osm_directed_graph", "minhash_neardup", "dup_ngram_spans",
              "osm_poi_nearest",
              # r15 (verdict task 3): the worst sf0.1 floor-dominated
              # gates that lacked sf1 numbers; osm_relation_members
              # stays floor-model-pinned instead (its relation synthesis
              # walks the customer dim, whose FK web is not replicated)
              "hll_intersect", "length_batches", "pack_positions"]
REPEATS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "7")))


def replicate(df, offsets: dict[str, int], k: int):
    """K key-offset copies; offsets are per KEY FAMILY (l_partkey shifts
    by part's p_partkey span, keeping referential integrity per replica)."""
    pieces = [df.select(*[
        (F.col(c) + i * offsets[c]).alias(c) if c in offsets else F.col(c)
        for c in df.columns]) for i in range(k)]
    return reduce(lambda a, b: a.unionByName(b), pieces)


def _trimmed_range(samples: list[float]) -> float:
    cut = min(2, (len(samples) - 3) // 2) if len(samples) >= 5 else 0
    core = sorted(samples)[cut:len(samples) - cut]
    return core[-1] - core[0]


def main() -> None:
    spark = get_spark(app_name=f"bench-sf1-{K}x")
    spark.sparkContext.setLogLevel("ERROR")

    # r15 added the events table: re-materialize if a pre-r15 DIR
    # lacks it (the _DONE marker alone would mask that)
    if (not os.path.exists(os.path.join(DIR, "_DONE"))
            or not os.path.exists(os.path.join(DIR, "events.parquet"))):
        rd = lambda t: spark.read.parquet(f"{SF_DIR}/{t}.parquet")  # noqa: E731
        pspan = rd("part").agg(F.max("p_partkey")).collect()[0][0] + 1
        # order-key span from ORDERS (the superset of lineitem's keys):
        # the OSM way-tag derivation joins l_orderkey against o_orderkey,
        # so both must shift by the same, collision-free amount
        ospan = rd("orders").agg(F.max("o_orderkey")).collect()[0][0] + 1
        espan = rd("events").agg(F.max("event_id")).collect()[0][0] + 1
        plans = {
            "part": (rd("part"), {"p_partkey": pspan}, 8),
            "lineitem": (rd("lineitem"),
                         {"l_orderkey": ospan, "l_partkey": pspan}, 32),
            "orders": (rd("orders"), {"o_orderkey": ospan}, 8),
            "documents": (rd("documents"), {"doc_id": 5_000_000}, 4),
            "embeddings": (rd("embeddings"), {"vec_id": 5_000_000}, 4),
            # r15: events for the sketch/windowing gates — self-contained
            # (no FK into the TPC-H web); user_id shifts so per-replica
            # user populations are disjoint and distinct-counts scale
            "events": (rd("events"),
                       {"event_id": espan, "user_id": 5_000_000}, 8),
        }
        for name, (df, offs, nfiles) in plans.items():
            (replicate(df, offs, K).repartition(nfiles)
             .write.mode("overwrite").parquet(f"{DIR}/{name}.parquet"))
        open(os.path.join(DIR, "_DONE"), "w").close()
        print(f"materialized {DIR} at K={K}", file=sys.stderr)

    from osm_pg_etl_spark.plans.registry import all_oracles, all_queries
    queries, oracles = all_queries(), all_oracles()

    con = duckdb.connect()
    # bounded memory + disk spill: the heavier oracles (the directed-
    # graph derivation replay) OOM-killed the default allocator at sf1
    # sharing the box with the Spark JVM; spilling is symmetric with
    # Spark's shuffle-spill behavior
    con.execute("SET memory_limit='48GB'")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    for t in ("part", "lineitem", "orders", "documents", "embeddings",
              "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{DIR}/{t}.parquet/*.parquet'")
        spark.read.parquet(f"{DIR}/{t}.parquet").count()  # warm both

    def run_spark(name: str) -> None:
        queries[name](spark, DIR).write.format("noop") \
            .mode("overwrite").save()

    def run_duck(name: str) -> None:
        # arrow(): full columnar materialization of every result column
        # (mirrors the noop sink's full evaluation) without fetchall()'s
        # per-row Python-object tax on wide results like knn_join
        con.execute(oracles[name]).arrow()

    # symmetric untimed warm passes (codegen/JIT vs buffer pool), then
    # median-of-R interleaved timed passes — bench.py's exact
    # methodology at the bigger scale
    for i in range(2):
        for name in DATA_BOUND:
            print(f"warm {i} {name}", file=sys.stderr, flush=True)
            run_spark(name)
            run_duck(name)
        spark.catalog.clearCache()

    s_passes: list[dict[str, float]] = []
    d_passes: list[dict[str, float]] = []
    for r in range(REPEATS):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        s_one: dict[str, float] = {}
        d_one: dict[str, float] = {}
        # r14 (verdict task 7): rotate the per-pass order so no query
        # systematically inherits one predecessor's JVM/buffer state
        # (the r13 tfidf-after-knn_join adjacency effect)
        rot = (r * len(DATA_BOUND)) // REPEATS
        pass_order = DATA_BOUND[rot:] + DATA_BOUND[:rot]
        for name in pass_order:
            t0 = time.perf_counter()
            run_spark(name)
            s_one[name] = time.perf_counter() - t0
            t0 = time.perf_counter()
            run_duck(name)
            d_one[name] = time.perf_counter() - t0
        s_passes.append(s_one)
        d_passes.append(d_one)

    rows = {}
    for name in DATA_BOUND:
        ss = [p[name] for p in s_passes]
        ds = [p[name] for p in d_passes]
        s, d = statistics.median(ss), statistics.median(ds)
        rows[name] = {"spark_sec": round(s, 3), "duckdb_sec": round(d, 3),
                      "ratio": round(s / d, 3) if d else None,
                      "spark_min": round(min(ss), 3),
                      "duckdb_min": round(min(ds), 3),
                      "spark_spread": round(_trimmed_range(ss), 3),
                      "duckdb_spread": round(_trimmed_range(ds), 3)}
        print(f"{name:24s} spark {s:7.2f}s (±{rows[name]['spark_spread']:.2f})"
              f"  duckdb {d:7.2f}s  ratio {s / d:5.2f}x")
    tot_s = sum(r["spark_sec"] for r in rows.values())
    tot_d = sum(r["duckdb_sec"] for r in rows.values())
    out = {"k": K, "base_sf_dir": SF_DIR, "repeats": REPEATS,
           "order_rotation": "per-pass deterministic rotation by "
                             "len/repeats (r14)",
           "spread_method": "range of central samples "
                            "(trim min(2,(n-3)//2) per side)",
           "duckdb_drain": "arrow() columnar fetch (symmetric with the "
                           "Spark noop sink; no per-row Python objects)",
           "queries": rows,
           "total_spark_sec": round(tot_s, 3),
           "total_duckdb_sec": round(tot_d, 3),
           "total_ratio": round(tot_s / tot_d, 3)}
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(f"total ratio {tot_s / tot_d:.2f}x -> {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()
