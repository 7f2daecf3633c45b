"""A/B the label_propagation edge-table materialization strategy on the
osm_communities gate (sf0.1, noop sink, interleaved passes).

Variants are injected by monkey-patching graph_algo's edge-prep step; the
algorithm itself is untouched, so results are identical by construction.

Usage: python scripts/ab_lpa.py [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from osm_pg_etl_spark.session import get_spark
    from osm_pg_etl_spark.operators import graph_algo
    from osm_pg_etl_spark.plans.registry import all_queries

    spark = get_spark(app_name="ab-lpa")
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()["osm_communities"]

    orig_lpa = graph_algo.label_propagation

    def make_variant(prep):
        def lpa(edges, n_iter=4, src="src", dst="dst", checkpoint_every=8):
            e = prep(graph_algo.symmetric_edges(edges, src, dst))
            labels = (e.select(F.col("a").alias("id")).distinct()
                      .withColumn("label", F.col("id")))
            for i in range(n_iter):
                labels = (e.join(labels.withColumnRenamed("id", "a"), "a")
                          .groupBy(F.col("b").alias("id"))
                          .agg(F.mode("label", True).alias("label")))
                if checkpoint_every and (i + 1) % checkpoint_every == 0 \
                        and i + 1 < n_iter:
                    labels = labels.localCheckpoint()
            return labels.select(F.col("id").alias("node"),
                                 F.col("label").alias("community"))
        return lpa

    variants = {
        "iter_cache(ckpt+repart+sort+cache)": make_variant(
            lambda df: graph_algo._iter_cache(df, "a")),
        "plain localCheckpoint (r14)": make_variant(
            lambda df: df.localCheckpoint()),
        "repart+sort+cache (no ckpt)": make_variant(
            lambda df: df.repartition("a").sortWithinPartitions("a").cache()),
        "repart+cache (no ckpt, no sort)": make_variant(
            lambda df: df.repartition("a").cache()),
    }

    # warm
    for _ in range(2):
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

    samples = {k: [] for k in variants}
    for _ in range(reps):
        for name, lpa in variants.items():
            graph_algo.label_propagation = lpa
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            q(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
    graph_algo.label_propagation = orig_lpa

    for name, ts in samples.items():
        print(f"{name:38s} median={statistics.median(ts):.3f} "
              f"min={min(ts):.3f} all={[round(t, 3) for t in ts]}")


if __name__ == "__main__":
    main()
