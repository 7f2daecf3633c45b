"""Distributed graph algorithms over edge-list DataFrames.

The reference stops at exporting a minimal edge list to igraph for network
analysis (``osm-pg-etl.md:31-105``: ``Graph.TupleList`` → components /
centrality → CSV COPY back). For 100 TB graphs that single-process hop is
the bottleneck, so the first analysis step — connected components — is
implemented natively on DataFrames here; the igraph export
(:mod:`.export`) stays available for the long tail of single-node analyses.

Connected components doubles as the *dedup clustering* step of a training
-data pipeline: near-duplicate pairs (MinHash/SimHash/embedding) are edges,
and each document keeps the minimum doc_id of its component as the
canonical representative.

Algorithm: iterative hash-min label propagation — every node repeatedly
takes the minimum label among itself and its neighbors. Each iteration is
one shuffle-join + one aggregation (both keyed on node id), and labels are
monotonically non-increasing, so convergence is detected with a cheap
``sum(label)`` fixpoint test instead of a change-join. Rounds needed =
graph diameter; that is fine for the dense derived test graphs and for
dedup clusters (tiny diameters), while high-diameter graphs (a continental
road network) would want the O(log² n) large-star/small-star contraction
[Kiveris et al., "Connected Components in MapReduce and Beyond"] — the
per-round dataflow below (symmetric edges, groupBy-min, lineage
truncation) is the building block either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetric_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected view of an edge list: both directions, self-loops dropped,
    deduplicated."""
    e = edges.select(F.col(src).cast("long").alias("a"),
                     F.col(dst).cast("long").alias("b"))
    return (e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct())


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst",
                         max_iter: int = 50) -> DataFrame:
    """(node, component) for every node appearing in ``edges``, where
    ``component`` is the minimum node id reachable from it — deterministic
    regardless of partitioning or iteration order.

    Per iteration: propagate neighbor labels across the symmetric edge list
    (equi-join on node id), fold with the current labels, take the min per
    node. ``localCheckpoint`` truncates the growing lineage so plan size
    stays constant across rounds (a real cluster job would use a
    checkpoint dir for fault tolerance instead).
    """
    und = symmetric_edges(edges, src, dst).cache()
    labels = (und.select(F.col("a").alias("node")).distinct()
              .withColumn("label", F.col("node")).localCheckpoint())

    prev_sum = None
    for _ in range(max_iter):
        # neighbor propagation: one hop along the original edges. A label
        # >= the receiving node's id can never win (the node's own label is
        # already <= its id, and the component minimum reaches every node
        # through strictly larger intermediates), so prune before the
        # shuffle — the same dominance argument bounds the oracle's
        # recursive closure.
        nbr = (und.join(labels, und["b"] == labels["node"])
               .select(und["a"].alias("node"), "label")
               .filter(F.col("label") < F.col("node")))
        # materialize once: hop feeds three consumers below (both sides of
        # the doubling self-join + the union)
        hop = (labels.unionByName(nbr)
               .groupBy("node").agg(F.min("label").alias("label"))
               .localCheckpoint())
        # pointer doubling: also adopt the label OF my label (every label is
        # itself a node, so the self-join is total) — path compression that
        # cuts convergence from O(diameter) to O(log diameter) rounds
        dbl = (hop.alias("x")
               .join(hop.alias("y"), F.col("x.label") == F.col("y.node"))
               .select(F.col("x.node").alias("node"),
                       F.col("y.label").alias("label"))
               .filter(F.col("label") < F.col("node")))
        labels = (hop.unionByName(dbl)
                  .groupBy("node").agg(F.min("label").alias("label"))
                  .localCheckpoint())
        # labels only ever decrease: equal sums <=> fixpoint reached
        cur_sum = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    und.unpersist()
    return labels.select("node", F.col("label").alias("component"))


def shortest_paths(edges: DataFrame, source: int, max_hops: int = 4,
                   src: str = "src", dst: str = "dst",
                   weight: str = "w") -> DataFrame:
    """Single-source shortest distances using at most ``max_hops`` edges —
    ``max_hops`` rounds of synchronous Bellman-Ford relaxation, the routing
    primitive behind the reference's "further routing with iGraph"
    (``osm-road-graphs.sql:56``, ``osm-pg-etl.md:31-62``) run distributed.

    Each round is one equi-join on the frontier + a min-aggregation; with
    ``max_hops`` = graph diameter it is exact SSSP. Results are
    deterministic: float ``(min, +)`` is still a monotone semiring
    (x ≤ y ⇒ a+x ≤ a+y in IEEE), so the k-round result equals the exact
    minimum over all ≤k-edge path sums. Returns (node, dist); unreached
    nodes are absent.
    """
    e = edges.select(F.col(src).cast("long").alias("u"),
                     F.col(dst).cast("long").alias("v"),
                     F.col(weight).cast("double").alias("w")).cache()
    spark = edges.sparkSession
    dist = spark.createDataFrame([(int(source), 0.0)], "node long, dist double")
    for _ in range(max_hops):
        relax = (e.join(dist, e["u"] == dist["node"])
                 .select(e["v"].alias("node"),
                         (dist["dist"] + e["w"]).alias("dist")))
        dist = (dist.unionByName(relax)
                .groupBy("node").agg(F.min("dist").alias("dist"))
                .localCheckpoint())
    e.unpersist()
    return dist


def dedup_clusters(docs: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id",
                   pair_cols: tuple[str, str] = ("id_a", "id_b")) -> DataFrame:
    """Cluster near-duplicate pairs into groups and pick one canonical
    document per group (the minimum id, mirroring ``exact_duplicates``'
    ``MIN(doc_id) AS keep_id``). Documents in no pair are their own
    cluster. Returns (doc_id, cluster_id, is_canonical)."""
    comp = connected_components(pairs, src=pair_cols[0], dst=pair_cols[1])
    d = docs.select(F.col(id_col).cast("long").alias(id_col))
    return (d.join(comp, d[id_col] == comp["node"], "left")
            .select(
                id_col,
                F.coalesce("component", F.col(id_col)).alias("cluster_id"))
            .withColumn("is_canonical",
                        (F.col(id_col) == F.col("cluster_id")).cast("boolean")))
