"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the full car-graph pipeline:
network filter → median imputation → topological split/merge → directed
expansion) on sf0.001. ``queries()``/``oracle_sql()`` expose every
implemented operator from SURVEY.md §2 plus the training-data-pipeline
extensions; the driver cross-checks them against DuckDB at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from osm_pg_etl_spark.plans import all_oracles, all_queries
from osm_pg_etl_spark.plans.osm_derived import q_osm_directed_graph


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_osm_directed_graph(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-checkable query; approximate
    operators (LSH top-k, banded SimHash pairs) are rows-only by design."""
    return all_oracles()
