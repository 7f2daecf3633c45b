"""Measure exact vs approx vs KMV-sketch quantile profiles — wall time
and value error — for SCALING.md's crossover row (r11, VERDICT task 5).

Usage: python scripts/quantile_crossover.py [sf_dir] [reps]

Interleaved reps (memory/bench-methodology-traps): each rep runs all
variants back-to-back so cache/JIT drift hits them equally.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from osm_pg_etl_spark.operators.stats import (quantile_sketch_by_group,
                                              quantiles_by_group)
from osm_pg_etl_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def run(fn):
    t0 = time.perf_counter()
    rows = fn().collect()
    return time.perf_counter() - t0, {tuple(r[c] for c in keys):
                                      {c: r[c] for c in pcols} for r in rows}


spark = get_spark()
li = spark.read.parquet(f"{SF}/lineitem.parquet")
li = li.localCheckpoint()  # measure the aggregates, not the scan
pcols = ["p25", "p50", "p75", "p90", "p99"]

results = {}
for label, gcols in (("3-group (l_returnflag)", ["l_returnflag"]),
                     ("high-card (l_suppkey)", ["l_suppkey"])):
    keys = gcols
    variants = {
        "exact": lambda g=gcols: quantiles_by_group(
            li, g, "l_extendedprice", method="exact"),
        "approx": lambda g=gcols: quantiles_by_group(
            li, g, "l_extendedprice", method="approx"),
        "kmv_sketch": lambda g=gcols: quantile_sketch_by_group(
            li, g, "l_extendedprice",
            hash_cols=["l_orderkey", "l_linenumber", "l_partkey"], k=256),
    }
    times: dict[str, list[float]] = {v: [] for v in variants}
    vals: dict[str, dict] = {}
    for _ in range(REPS):
        for name, fn in variants.items():
            dt, v = run(fn)
            times[name].append(dt)
            vals[name] = v
    exact = vals["exact"]
    err = {}
    for name in ("approx", "kmv_sketch"):
        rel = [abs(vals[name][g][p] - exact[g][p]) / abs(exact[g][p])
               for g in exact for p in pcols if exact[g][p]]
        err[name] = {"max_rel_err": max(rel), "mean_rel_err":
                     sum(rel) / len(rel)}
    results[label] = {
        "groups": len(exact),
        "median_sec": {n: sorted(t)[len(t) // 2] for n, t in times.items()},
        "min_sec": {n: min(t) for n, t in times.items()},
        "error_vs_exact": err,
    }
print(json.dumps({"sf_dir": SF, "reps": REPS, "results": results},
                 indent=2))
spark.stop()
