"""Interleaved A/B bench of two code versions (r12, VERDICT task 1).

BENCH_r11 showed a uniform +7.7% total vs BENCH_r10 on byte-identical
headline plans — the pattern of environment drift, not a regression.
Per this repo's own r10 lesson (sequential blocks lie: memory
`spark-cache-hygiene`), the only way to decide is ALTERNATING runs of
the two checkouts in one session: A,B,A,B,A,B — each run a fresh
`python bench.py` process (own JVM, own warm-up, REPEATS timed passes),
so slow environment drift hits both versions symmetrically.

Usage: python scripts/bench_ab.py dirA dirB [rounds] [out.json]

Each dir must be a checkout with bench.py at its root (a git worktree).
Writes per-version per-query medians-of-medians, totals, and the
relative delta to out.json (default ABCMP_r12.json in the CWD).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time


def main() -> None:
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    out_path = sys.argv[4] if len(sys.argv) > 4 else "ABCMP_r12.json"

    env = dict(os.environ,
               SPARK_GRAFT_BENCH_REPEATS=os.environ.get(
                   "SPARK_GRAFT_BENCH_REPEATS", "3"),
               SPARK_GRAFT_NO_SCALING="1")
    runs: dict[str, list[dict]] = {"A": [], "B": []}
    for r in range(rounds):
        for tag, d in (("A", a_dir), ("B", b_dir)):
            t0 = time.time()
            proc = subprocess.run(
                [sys.executable, "bench.py"], cwd=d, env=env,
                capture_output=True, text=True, timeout=3600)
            if proc.returncode != 0:
                print(proc.stdout[-2000:], proc.stderr[-2000:],
                      file=sys.stderr)
                raise SystemExit(f"{tag} run {r} failed")
            with open(os.path.join(d, "BENCH_DETAIL.json")) as f:
                detail = json.load(f)
            runs[tag].append(detail)
            print(f"round {r} {tag}: total {detail['value']:.2f}s "
                  f"({time.time() - t0:.0f}s wall)", flush=True)

    queries = list(runs["A"][0]["queries"])
    agg: dict[str, dict] = {}
    for tag in ("A", "B"):
        per_q = {q: round(statistics.median(
            d["queries"][q] for d in runs[tag]), 3) for q in queries}
        totals = [d["value"] for d in runs[tag]]
        agg[tag] = {"totals": [round(t, 3) for t in totals],
                    "total_median": round(statistics.median(totals), 3),
                    "queries_median": per_q}
    delta = (agg["B"]["total_median"] / agg["A"]["total_median"] - 1) * 100
    worst = sorted(
        ((q, agg["B"]["queries_median"][q] / agg["A"]["queries_median"][q])
         for q in queries if agg["A"]["queries_median"][q] > 0),
        key=lambda kv: kv[1], reverse=True)[:5]
    out = {"a_dir": a_dir, "b_dir": b_dir, "rounds": rounds,
           "repeats_per_run": int(env["SPARK_GRAFT_BENCH_REPEATS"]),
           "interleaving": "A,B alternated per round, fresh process each",
           "A": agg["A"], "B": agg["B"],
           "b_vs_a_total_pct": round(delta, 2),
           "worst_b_vs_a": [{"query": q, "ratio": round(x, 3)}
                            for q, x in worst]}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"A total {agg['A']['total_median']}s  "
          f"B total {agg['B']['total_median']}s  "
          f"B vs A {delta:+.2f}% -> {out_path}")


if __name__ == "__main__":
    main()
