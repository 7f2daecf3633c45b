"""One side of the sf1 interleaved A/B (scripts/ab_sf1.py): run the
DATA_BOUND set at a materialized ~sf1 dir with bench.py's methodology
(2 untimed warm passes, then REPEATS interleaved timed passes over the
whole set with clearCache + System.gc() preambles; per-query medians)
and print ONE JSON line.

Run with cwd = the checkout under test — the script imports the
package from os.getcwd(), so the SAME file can drive two different
checkouts (the A side predates this script's existence).

Usage: python scripts/_sf1_run.py <sf1_dir> [repeats]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.getcwd())

DATA_BOUND = ["osm_merged_network", "osm_communities", "quantile_profile",
              "rollup_counts", "knn_join", "tfidf_top_terms",
              "osm_directed_graph", "minhash_neardup", "dup_ngram_spans",
              "osm_poi_nearest",
              "hll_intersect", "length_batches", "pack_positions"]


def main() -> None:
    sf1_dir = sys.argv[1]
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from osm_pg_etl_spark.plans.registry import all_queries
    from osm_pg_etl_spark.session import get_spark

    spark = get_spark(app_name="ab-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    for t in ("part", "lineitem", "orders", "documents", "embeddings",
              "events"):
        spark.read.parquet(f"{sf1_dir}/{t}.parquet").count()

    for _ in range(2):
        for name in DATA_BOUND:
            queries[name](spark, sf1_dir).write.format("noop") \
                .mode("overwrite").save()
        spark.catalog.clearCache()

    passes: list[dict[str, float]] = []
    for r in range(repeats):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        one: dict[str, float] = {}
        rot = (r * len(DATA_BOUND)) // repeats
        for name in DATA_BOUND[rot:] + DATA_BOUND[:rot]:
            t0 = time.perf_counter()
            queries[name](spark, sf1_dir).write.format("noop") \
                .mode("overwrite").save()
            one[name] = time.perf_counter() - t0
        passes.append(one)

    med = {n: round(statistics.median([p[n] for p in passes]), 3)
           for n in DATA_BOUND}
    print(json.dumps({"queries": med,
                      "total": round(sum(med.values()), 3),
                      "repeats": repeats, "cwd": os.getcwd()}))


if __name__ == "__main__":
    main()
