"""Interleaved sf1 A/B of two checkouts over the DATA_BOUND set
(r15-verdict task 3: round-over-round perf evidence for data-bound
queries belongs at sf1, where sf0.1 is scheduler-floor-saturated).

Materializes the K-replica ~sf1 parquet once (bench_sf1.py's exact
replication recipe, shared _DONE marker), then alternates fresh
`python scripts/_sf1_run.py` processes with cwd = each checkout
(A,B per round, 3 rounds) so environment drift hits both sides
symmetrically — this box's documented variance protocol.

Usage: python scripts/ab_sf1.py dirA dirB [rounds] [out.json]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, ".")

K = int(os.environ.get("SPARK_GRAFT_SF1_K", "10"))
DIR = f"/tmp/sf1_bench_k{K}"
RUNNER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "_sf1_run.py")


def ensure_materialized() -> None:
    """Materialize in a SUBPROCESS: the materializer's Spark JVM must be
    fully gone before the first timed run (a lingering gateway JVM was
    observed burning ~70% of a core after spark.stop(), which would
    contaminate the interleaved timings)."""
    if os.path.exists(os.path.join(DIR, "_DONE")) \
            and os.path.exists(os.path.join(DIR, "events.parquet")):
        return
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--materialize"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=3600)
    if proc.returncode != 0 \
            or not os.path.exists(os.path.join(DIR, "_DONE")):
        raise SystemExit("sf1 materialization failed")


def _materialize() -> None:
    # bench_sf1.py parses sys.argv at import, so its replication recipe
    # is reproduced inline (same offsets, same file counts)
    from functools import reduce

    from pyspark.sql import functions as F

    from osm_pg_etl_spark.session import get_spark

    SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def replicate(df, offsets, k):
        pieces = [df.select(*[
            (F.col(c) + i * offsets[c]).alias(c) if c in offsets
            else F.col(c) for c in df.columns]) for i in range(k)]
        return reduce(lambda a, b: a.unionByName(b), pieces)

    spark = get_spark(app_name="sf1-materialize")
    spark.sparkContext.setLogLevel("ERROR")
    rd = lambda t: spark.read.parquet(f"{SF_DIR}/{t}.parquet")  # noqa: E731
    pspan = rd("part").agg(F.max("p_partkey")).collect()[0][0] + 1
    ospan = rd("orders").agg(F.max("o_orderkey")).collect()[0][0] + 1
    espan = rd("events").agg(F.max("event_id")).collect()[0][0] + 1
    plans = {
        "part": (rd("part"), {"p_partkey": pspan}, 8),
        "lineitem": (rd("lineitem"),
                     {"l_orderkey": ospan, "l_partkey": pspan}, 32),
        "orders": (rd("orders"), {"o_orderkey": ospan}, 8),
        "documents": (rd("documents"), {"doc_id": 5_000_000}, 4),
        "embeddings": (rd("embeddings"), {"vec_id": 5_000_000}, 4),
        "events": (rd("events"),
                   {"event_id": espan, "user_id": 5_000_000}, 8),
    }
    for name, (df, offs, nfiles) in plans.items():
        (replicate(df, offs, K).repartition(nfiles)
         .write.mode("overwrite").parquet(f"{DIR}/{name}.parquet"))
    open(os.path.join(DIR, "_DONE"), "w").close()
    spark.stop()
    print(f"materialized {DIR} at K={K}", file=sys.stderr)


def main() -> None:
    if sys.argv[1:2] == ["--materialize"]:
        _materialize()
        return
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    out_path = sys.argv[4] if len(sys.argv) > 4 else "ABCMP_sf1_r16.json"

    ensure_materialized()
    runs: dict[str, list[dict]] = {"A": [], "B": []}
    for r in range(rounds):
        for tag, d in (("A", a_dir), ("B", b_dir)):
            t0 = time.time()
            proc = subprocess.run(
                [sys.executable, RUNNER, DIR, "3"], cwd=d,
                capture_output=True, text=True, timeout=7200)
            if proc.returncode != 0:
                print(proc.stdout[-2000:], proc.stderr[-2000:],
                      file=sys.stderr)
                raise SystemExit(f"{tag} run {r} failed")
            detail = json.loads(proc.stdout.strip().splitlines()[-1])
            runs[tag].append(detail)
            print(f"round {r} {tag}: total {detail['total']:.2f}s "
                  f"({time.time() - t0:.0f}s wall)", flush=True)

    queries = list(runs["A"][0]["queries"])
    agg: dict[str, dict] = {}
    for tag in ("A", "B"):
        per_q = {q: round(statistics.median(
            [d["queries"][q] for d in runs[tag]]), 3) for q in queries}
        totals = [d["total"] for d in runs[tag]]
        agg[tag] = {"totals": totals,
                    "total_median": round(statistics.median(totals), 3),
                    "queries_median": per_q}
    speedup = {q: round(agg["A"]["queries_median"][q]
                        / agg["B"]["queries_median"][q], 3)
               for q in queries if agg["B"]["queries_median"][q]}
    out = {"a_dir": a_dir, "b_dir": b_dir, "rounds": rounds, "k": K,
           "sf1_dir": DIR, "repeats_per_run": 3,
           "interleaving": "A,B alternated per round, fresh process each",
           "A": agg["A"], "B": agg["B"],
           "speedup_a_over_b": speedup,
           "total_speedup": round(agg["A"]["total_median"]
                                  / agg["B"]["total_median"], 3)}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    for q in queries:
        print(f"{q:24s} A {agg['A']['queries_median'][q]:8.3f}  "
              f"B {agg['B']['queries_median'][q]:8.3f}  "
              f"speedup {speedup.get(q)}")
    print(f"total A {agg['A']['total_median']} -> "
          f"B {agg['B']['total_median']} "
          f"({out['total_speedup']}x) -> {out_path}")


if __name__ == "__main__":
    main()
