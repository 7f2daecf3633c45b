"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line {"metric", "value", "unit", "queries", "sf"}.

Each query is forced end-to-end with the noop sink (full evaluation, no
driver collect). Headline set: the flagship OSM graph pipeline, the heavy
relational operators, and the training-data extensions.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "group_count",          # TPC-H q1-style scan+agg over lineitem
    "tag_values",           # map-column tag summary (osm-explore parity)
    "running_sums",         # window running sums
    "range_join",           # equi+BETWEEN join
    "osm_merged_network",   # topological split/merge (crown jewel)
    "osm_directed_graph",   # full flagship pipeline incl. imputation
    "osm_mode_flags",       # UPDATE-cascade compilation
    "minhash_neardup",      # MinHash+LSH dedup
    "simhash",              # per-row SimHash fingerprints
    "similarity_topk",      # brute-force cosine top-k
    "quality_features",     # text quality scoring
    "tfidf_top_terms",      # inverted-index tf-idf
    "pii_redact",           # regex scrub chain
    "tumbling_window",      # event-time window agg
    "sliding_window",       # overlapping event-time windows
    "dedup_events",         # stream-dedup batch equivalent
    "pack_positions",       # distributed prefix-sum packing (r3 fix)
    "osm_relation_members", # relations surface (r3)
    "osm_explore_summary",  # tags_summary catalog (r3)
    "asof_join",            # point-in-time union-trick join (r4)
    "dup_ngram_spans",      # exact substring-dup profile (r4)
    "quantile_profile",     # exact multi-quantile aggregate (r4)
    "rollup_counts",        # ROLLUP grouping-sets aggregate (r4)
    "osm_communities",      # label-propagation communities (r4)
    "gap_fill",             # time-series gap fill + forward fill (r4)
    "length_batches",       # length-bucketed batch assignment (r4)
    "group_regression",     # one-pass per-group OLS moments (r4)
    "join5_revenue",        # TPC-H Q5-shape 5-way join (r4)
    "osm_poi_nearest",      # grid-blocked nearest-neighbour snap (r4)
    "knn_join",             # LSH-bucketed self-KNN similarity graph (r6)
    "hll_intersect",        # mergeable-sketch audience overlap (r6)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from osm_pg_etl_spark.session import get_spark
    from osm_pg_etl_spark.plans.registry import all_queries

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # Warm the JVM, parquet footers, and the OS page cache for every input
    # table so timings measure the queries, not first-touch disk reads or
    # JIT warm-up (a cold first run measured ~2.5x slower than steady state
    # on identical plans).
    from osm_pg_etl_spark.sources.io import read_testdata
    for name in ("region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"):
        if os.path.exists(os.path.join(sf_dir, f"{name}.parquet")):
            read_testdata(spark, sf_dir, name).count()

    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) \
        if "sf" in sf_dir else None

    # Two untimed passes over the whole set: the table warm-up above covers
    # IO, but each query's first execution pays whole-stage-codegen
    # compilation and the first couple of executions pay tiered C2 JIT
    # (measured: big plans run 2-3x slower on their first post-warm
    # execution than on the third). The timed pass below therefore measures
    # the steady-state engine, not Janino/C2. Recorded as "warm": true in
    # the output so cross-round comparisons know the methodology.
    for _ in range(2):
        for name in HEADLINE:
            queries[name](spark, sf_dir) \
                .write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    # (clearCache above after each pass: the timed queries must rebuild
    # derive_osm's cached nodes/way_nodes themselves — only the JIT stays
    # warm, exactly as previous rounds.)
    # MEDIAN-OF-R interleaved timed passes (default 7): single-shot
    # run-to-run spread reached 50% on sub-2 s queries (r5 verdict:
    # quantile_profile 1.25 vs 1.85 s same-code), and r9 showed ±2.4x
    # per-query swings on byte-identical code with 3 passes — one GC
    # pause or JIT recompile lands in a random query's wall time. Each
    # pass replays the WHOLE set (A,B,C,A,B,C — never A,A,A,B,B,B) after
    # a clearCache + System.gc(), so shared-JVM state at query N's start
    # is the same every pass and GC debt from pass k-1 isn't billed to
    # pass k's first queries. Reported per query: the MEDIAN across
    # passes (the headline number, methodology-continuous with r4+), the
    # MIN (the cleanest estimator of the deterministic work under
    # additive noise — compare THIS across rounds for sub-second
    # queries), and a TRIMMED spread — the range after trimming
    # min(2, (n-3)//2) samples per side (middle 3 of the default 7;
    # middle 3 of 5), so one or two GC outliers cannot define the
    # spread; for <5 repeats it degrades to the plain max-min range.
    import statistics

    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "7")))
    passes: list[dict[str, float]] = []
    for _ in range(repeats):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        one: dict[str, float] = {}
        for name in HEADLINE:
            fn = queries[name]
            start = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            one[name] = time.perf_counter() - start
        passes.append(one)
    def _trimmed_range(samples: list[float]) -> float:
        cut = min(2, (len(samples) - 3) // 2) if len(samples) >= 5 else 0
        core = sorted(samples)[cut:len(samples) - cut]
        return core[-1] - core[0]

    # NOTE a rejected variant: adaptive per-query top-up passes (rerun
    # only the noisy subset) made spreads WORSE — samples from a
    # subset-only pass have a different shared-JVM context than the
    # full-set passes, so mixing the two distributions widens the range.
    # All samples must come from structurally identical passes.
    samples = {n: [p[n] for p in passes] for n in HEADLINE}

    timings = {n: round(statistics.median(samples[n]), 3) for n in HEADLINE}
    mins = {n: round(min(samples[n]), 3) for n in HEADLINE}
    spread = {n: round(_trimmed_range(samples[n]), 3) for n in HEADLINE}

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "warm": True,
        "repeats": repeats,
        "queries_min": mins,
        "spread": spread,
        "spread_method": "range of the central samples "
                         "(trim min(2,(n-3)//2) per side)",
        "n_samples": {n: len(samples[n]) for n in HEADLINE},
    }

    # Scaling signal: re-run the set at a 10x-smaller SF and report the
    # per-query time ratio — a cheap proxy for "does cost scale with data
    # or with fixed constants" (ratio ≈ 1 means job-floor-bound; ratio
    # approaching 10 means data-bound) ahead of any 100x claim.
    small_dir = sf_dir.replace("sf0.1", "sf0.01")
    if small_dir != sf_dir and os.path.isdir(small_dir) \
            and os.environ.get("SPARK_GRAFT_NO_SCALING") != "1":
        small: dict[str, float] = {}
        for name in HEADLINE:
            start = time.perf_counter()
            queries[name](spark, small_dir) \
                .write.format("noop").mode("overwrite").save()
            small[name] = round(time.perf_counter() - start, 3)
        out["sf_small"] = 0.01
        out["queries_small"] = small
        out["scaling_ratio"] = {
            n: round(timings[n] / small[n], 2) if small[n] > 0 else None
            for n in HEADLINE}

    # Full detail (incl. the scaling pass) goes to a sidecar file; the
    # driver only captures the last ~2000 chars of stdout, so the FINAL
    # printed line must stay compact (round-4's line outgrew the window
    # and BENCH_r04 recorded "parsed": null). The last line keeps the
    # required {metric,value,unit,queries,sf} shape, dropping the
    # scaling extras; if even that would overflow the capture window it
    # degrades to totals-only.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    compact = {k: out[k] for k in
               ("metric", "value", "unit", "queries", "sf", "warm")}
    line = json.dumps(compact)
    if len(line) > 1800:
        compact.pop("queries")
        line = json.dumps(compact)
    print(line)


if __name__ == "__main__":
    main()
