"""Connected components + dedup clustering (operators.graph_algo)."""

from osm_pg_etl_spark.operators.graph_algo import (
    connected_components,
    dedup_clusters,
    symmetric_edges,
)


def test_symmetric_edges_drops_self_loops(spark):
    edges = spark.createDataFrame([(1, 2), (2, 1), (7, 7)], "src long, dst long")
    got = {(r["a"], r["b"]) for r in symmetric_edges(edges).collect()}
    assert got == {(1, 2), (2, 1)}


def test_connected_components_chain_and_island(spark):
    # chain 1-2-3-4 (via out-of-order directed edges), island {10,11},
    # self-loop-only node 7 (no non-trivial edge -> not part of any component)
    edges = spark.createDataFrame(
        [(2, 1), (3, 2), (3, 4), (11, 10), (7, 7)], "src long, dst long")
    got = {r["node"]: r["component"]
           for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_long_path_converges(spark):
    # a 40-hop path exercises >1 doubling round (hash-min alone would need
    # ~40 rounds; max_iter=50 would still pass, but doubling must not break
    # correctness on deep paths)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 41)], "src long, dst long")
    got = {r["node"]: r["component"]
           for r in connected_components(edges).collect()}
    assert got == {i: 1 for i in range(1, 42)}


def test_dedup_clusters_canonical_pick(spark):
    docs = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 5)], "doc_id long")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    got = {r["doc_id"]: (r["cluster_id"], r["is_canonical"])
           for r in dedup_clusters(docs, pairs).collect()}
    assert got == {1: (1, True), 2: (1, False), 3: (1, False),
                   4: (4, True), 5: (5, True)}
