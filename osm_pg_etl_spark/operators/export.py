"""Graph export / result write-back — SURVEY §2.1 S7-S8
(``osm-pg-etl.md:31-105``).

The reference pulls the minimal edge list into pandas, iterates
``itertuples`` into ``igraph.Graph.TupleList``, then bulk-loads analysis
results back via an in-memory CSV ``COPY`` pipe. Spark-side: Arrow-backed
``toPandas`` for the hop (the edge list is the *minimal* 4-column table, not
the fact data), and ``df.write`` (already bulk) for write-back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def edge_tuples(edge_list: DataFrame):
    """Materialize the minimal edge list as an iterator of plain tuples —
    the exact shape ``igraph.Graph.TupleList`` consumes
    (``osm-pg-etl.md:38-62``). Only call on the minimal projection."""
    pdf = edge_list.toPandas()
    return pdf.itertuples(index=False, name=None)


def to_igraph(edge_list: DataFrame, directed: bool = True,
              edge_attrs: tuple[str, ...] = ("length", "speed_limit")):
    """Build an igraph graph from a (start_node, end_node, *attrs) edge list.
    igraph is optional in this environment — gated behind an import."""
    try:
        import igraph  # noqa: PLC0415
    except ImportError as exc:  # pragma: no cover - igraph absent in CI
        raise NotImplementedError(
            "python-igraph is not installed; use edge_tuples() and build the "
            "graph in an environment that has it") from exc
    return igraph.Graph.TupleList(
        edge_tuples(edge_list), directed=directed, edge_attrs=list(edge_attrs))


def write_back(spark: SparkSession, pdf, path: str, fmt: str = "parquet") -> None:
    """Bulk write-back of driver-side analysis results (the CSV-COPY analog,
    ``osm-pg-etl.md:92-105``): Arrow createDataFrame → distributed write."""
    spark.createDataFrame(pdf).write.mode("overwrite").format(fmt).save(path)
