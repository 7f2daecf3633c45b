"""Change-feed maintenance (S9), Structured Streaming hook, and the
igraph-export / write-back surface (S7-S8)."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from osm_pg_etl_spark.operators.export import edge_tuples, to_igraph, write_back
from osm_pg_etl_spark.streaming.actions import (
    apply_actions,
    incremental_pipeline,
    windowed_event_counts,
)


@pytest.fixture()
def snapshot(spark):
    return spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, payload string")


def test_apply_actions_cmd(spark, snapshot):
    # changeset: create 4, modify 2, delete 3 (pgsnapshot C/M/D semantics)
    actions = spark.createDataFrame(
        [("N", "C", 4), ("N", "M", 2), ("N", "D", 3), ("W", "D", 1)],
        "data_type string, action string, id long")
    changed = spark.createDataFrame(
        [(4, "new"), (2, "b2")], "id long, payload string")
    got = {r["id"]: r["payload"] for r in
           apply_actions(snapshot, actions, changed, "N").collect()}
    # the W-typed delete of id 1 must NOT touch the nodes snapshot
    assert got == {1: "a", 2: "b2", 4: "new"}


def test_incremental_pipeline_foreach_batch(spark, snapshot):
    with tempfile.TemporaryDirectory() as tmp:
        changes, ckpt = os.path.join(tmp, "changes"), os.path.join(tmp, "ckpt")
        batch = spark.createDataFrame(
            [("N", "C", 10), ("N", "D", 1)], "data_type string, action string, id long")
        batch.write.parquet(changes)

        seen: list[tuple[int, int]] = []
        q = incremental_pipeline(
            spark, changes, ckpt,
            on_batch=lambda df, bid: seen.append((bid, df.count())),
            schema=batch.schema)
        q.awaitTermination(60)
        assert seen == [(0, 2)]


def test_windowed_event_counts_batch_parity(spark):
    events = spark.createDataFrame(
        [("2026-01-01 00:10:00", "click", 1.0),
         ("2026-01-01 00:50:00", "click", 2.0),
         ("2026-01-01 01:10:00", "view", 5.0)],
        "ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {(str(r["window_start"]), r["event_type"]):
           (r["n_events"], r["sum_value"])
           for r in windowed_event_counts(events).collect()}
    assert got == {
        ("2026-01-01 00:00:00", "click"): (2, 3.0),
        ("2026-01-01 01:00:00", "view"): (1, 5.0),
    }


def test_windowed_event_counts_streaming_with_watermark(spark):
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "events")
        events = spark.createDataFrame(
            [("2026-01-01 00:10:00", "click", 1.0),
             ("2026-01-01 00:20:00", "click", 2.0)],
            "ts string, event_type string, value double",
        ).withColumn("ts", F.to_timestamp("ts"))
        events.write.parquet(src)
        stream = spark.readStream.schema(events.schema).parquet(src)
        out = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
        q = (out.writeStream.format("memory").queryName("wec")
             .outputMode("append")
             .option("checkpointLocation", os.path.join(tmp, "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        # append mode emits only watermark-closed windows; with a single
        # availableNow batch nothing closes — the point is the streaming
        # plan (watermark + window agg) executes end to end
        assert spark.table("wec").columns == [
            "window_start", "event_type", "n_events", "sum_value"]


def test_edge_tuples_shape(spark):
    edges = spark.createDataFrame(
        [(1, 2, 0.5, 50), (2, 3, 1.5, 30)],
        "start_node long, end_node long, length double, speed_limit int")
    got = sorted(edge_tuples(edges))
    assert got == [(1, 2, 0.5, 50), (2, 3, 1.5, 30)]
    try:
        import igraph  # noqa: F401
        g = to_igraph(edges)
        assert g.ecount() == 2
    except ImportError:
        with pytest.raises(NotImplementedError):
            to_igraph(edges)


def test_write_back_roundtrip(spark):
    import pandas as pd

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "out")
        pdf = pd.DataFrame({"node": [1, 2], "betweenness": [0.5, 0.7]})
        write_back(spark, pdf, path)
        got = sorted((r["node"], r["betweenness"])
                     for r in spark.read.parquet(path).collect())
        assert got == [(1, 0.5), (2, 0.7)]
