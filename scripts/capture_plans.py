"""Capture .explain("formatted") for queries into plans/<tag>/<q>_<suffix>.txt.

Usage: python scripts/capture_plans.py <tag> <suffix> [query ...]
Defaults to the bench HEADLINE set when no queries are named.
Also appends a one-line plan summary (Exchange count, join strategies,
Python-eval nodes) to stdout per query so plan-shape regressions are
greppable.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from osm_pg_etl_spark.session import get_spark
    from osm_pg_etl_spark.plans.registry import all_queries

    if not names:
        import bench
        names = list(bench.HEADLINE)

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name=f"plans-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = len(re.findall(r"\bExchange\b", plan))
        joins = sorted(set(re.findall(
            r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
            r"BroadcastNestedLoopJoin|CartesianProduct)", plan)))
        pyev = sorted(set(re.findall(
            r"(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|"
            r"FlatMapGroupsInPandas)", plan)))
        print(f"{name}: Exchange={n_ex} joins={joins} python={pyev}")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
