"""Plan lint: dump the physical plan of every registered query and flag
anti-patterns that would hurt at scale — cartesian products, row-at-a-time
Python UDFs, and parquet scans that read more columns than the query needs.

Usage: python scripts/plan_lint.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from osm_pg_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from osm_pg_etl_spark.plans.registry import all_queries

    spark = get_spark(app_name="plan-lint")
    spark.sparkContext.setLogLevel("ERROR")

    flags_total = 0
    for name, fn in sorted(all_queries().items()):
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {exc}")
            flags_total += 1
            continue
        flags = []
        if "CartesianProduct" in plan:
            flags.append("cartesian-product")
        if "BatchEvalPython" in plan:
            flags.append("row-python-udf")
        wide = [m for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan)
                if m.count(",") >= 10]
        if wide:
            flags.append(f"wide-scan({max(m.count(',') + 1 for m in wide)} cols)")
        n_smj = plan.count("SortMergeJoin")
        n_bhj = plan.count("BroadcastHashJoin")
        status = "FLAG " + ",".join(flags) if flags else "ok"
        print(f"{status:28s} {name}  (smj={n_smj} bhj={n_bhj})")
        flags_total += bool(flags)
    print(f"\n{flags_total} flagged")


if __name__ == "__main__":
    main()
