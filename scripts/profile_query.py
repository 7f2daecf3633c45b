"""Split a query's wall time into (build, analyze+optimize+physical-plan,
execute) and count jobs/stages/tasks via a listener — guide §1/§7.3: a
multi-second query at sf0.01 is plan/floor-dominated, not data-bound.

Usage: python scripts/profile_query.py <query> [reps] [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = sys.argv[3] if len(sys.argv) > 3 \
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from osm_pg_etl_spark.session import get_spark
    from osm_pg_etl_spark.plans.registry import all_queries

    spark = get_spark(app_name=f"profile-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()[name]

    # job/stage/task counters via the status tracker delta
    tracker = spark.sparkContext.statusTracker()

    for _ in range(2):  # warm
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

    rows = []
    for _ in range(reps):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        df = q(spark, sf_dir)
        t1 = time.perf_counter()
        # force full physical planning (explain string) without execution
        df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        t2 = time.perf_counter()
        jobs0 = tracker.getJobIdsForGroup(None)
        df.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        jobs1 = tracker.getJobIdsForGroup(None)
        rows.append((t1 - t0, t2 - t1, t3 - t2, len(set(jobs1) - set(jobs0))))

    med = [round(statistics.median(c), 3) for c in zip(*rows)]
    print(f"{name}: build={med[0]} plan={med[1]} exec={med[2]} "
          f"jobs/run={med[3]} total={round(sum(med[:3]), 3)} sf={sf_dir}")


if __name__ == "__main__":
    main()
