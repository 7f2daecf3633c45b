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


def test_windowed_event_counts_sliding(spark):
    events = spark.createDataFrame(
        [("2026-01-01 00:10:00", "click", 1.0),
         ("2026-01-01 00:40:00", "click", 2.0)],
        "ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {(str(r["window_start"]), r["event_type"]):
           (r["n_events"], r["sum_value"])
           for r in windowed_event_counts(
               events, window="1 hour", slide="30 minutes").collect()}
    # 00:10 -> windows starting 23:30 and 00:00; 00:40 -> 00:00 and 00:30
    assert got == {
        ("2025-12-31 23:30:00", "click"): (1, 1.0),
        ("2026-01-01 00:00:00", "click"): (2, 3.0),
        ("2026-01-01 00:30:00", "click"): (1, 2.0),
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


def test_dedup_events_batch_deterministic(spark):
    from osm_pg_etl_spark.streaming.actions import dedup_events

    ev = spark.createDataFrame(
        [(3, "2026-01-01 00:20:00", 7, "click", 3.0),
         (1, "2026-01-01 00:10:00", 7, "click", 1.0),   # earliest -> kept
         (2, "2026-01-01 00:10:00", 7, "view", 2.0),
         (4, "2026-01-01 00:10:00", 8, "click", 4.0)],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    kept = sorted(r["event_id"] for r in
                  dedup_events(ev, key_cols=("user_id", "event_type")).collect())
    assert kept == [1, 2, 4]


def test_dedup_events_streaming_drops_cross_batch_dupes(spark):
    from osm_pg_etl_spark.streaming.actions import dedup_events

    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as tmp:
        src = os.path.join(tmp, "events")
        os.makedirs(src)
        import pyarrow as pa
        import pyarrow.parquet as pq

        schema = "event_id long, ts string, user_id long, value double"

        def write_file(rows, name):
            df = spark.createDataFrame(rows, schema) \
                .withColumn("ts", F.to_timestamp("ts"))
            pq.write_table(pa.Table.from_pandas(df.toPandas()),
                           os.path.join(src, name), coerce_timestamps="us")
            return df

        b1 = write_file([(1, "2026-01-01 00:10:00", 7, 1.0),
                         (2, "2026-01-01 00:11:00", 8, 2.0)], "b1.parquet")
        # batch 2 arrives with a duplicate key (1) + one new key (3)
        write_file([(1, "2026-01-01 00:30:00", 7, 9.0),
                    (3, "2026-01-01 00:12:00", 9, 3.0)], "b2.parquet")

        stream = (spark.readStream.schema(b1.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        out = dedup_events(stream, key_cols=("event_id",), watermark="1 hour")
        q = (out.writeStream.format("memory").queryName("dedup_ev")
             .outputMode("append")
             .option("checkpointLocation", os.path.join(tmp, "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = sorted(r["event_id"] for r in spark.table("dedup_ev").collect())
        # one row per distinct key; batch 2's re-send of key 1 dropped by
        # the cross-batch dedup state
        assert got == [1, 2, 3]


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


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_capped_sessions_batch_cap_splits(spark):
    from osm_pg_etl_spark.streaming.actions import capped_sessions

    # one gap-island (25-min spacing), split by the 120-min cap at 125 min
    rows = [(1, f"2026-01-01 {h:02d}:{m:02d}:00", 1.0)
            for h, m in [(0, 0), (0, 25), (0, 50), (1, 15), (1, 40),
                         (2, 5), (2, 30), (2, 55)]]
    got = sorted((str(r["session_start"]), r["n_events"]) for r in
                 capped_sessions(_ev(spark, rows), gap_minutes=30,
                                 max_duration_minutes=120).collect())
    assert got == [("2026-01-01 00:00:00", 5), ("2026-01-01 02:05:00", 3)]


def test_capped_sessions_batch_gap_splits(spark):
    from osm_pg_etl_spark.streaming.actions import capped_sessions

    rows = [(1, "2026-01-01 00:00:00", 1.0), (1, "2026-01-01 00:10:00", 2.0),
            (1, "2026-01-01 01:00:00", 3.0),          # 50-min gap -> new island
            (2, "2026-01-01 00:00:00", 4.0)]
    got = sorted((r["user_id"], str(r["session_start"]), r["n_events"],
                  r["sum_value"]) for r in
                 capped_sessions(_ev(spark, rows)).collect())
    assert got == [(1, "2026-01-01 00:00:00", 2, 3.0),
                   (1, "2026-01-01 01:00:00", 1, 3.0),
                   (2, "2026-01-01 00:00:00", 1, 4.0)]


def test_capped_sessions_hot_key_100x(spark):
    """Hot-key contract: one bot user at 100× the median per-key volume
    must produce exactly the capped sessions the semantics dictate (one
    gap-island cut into max_duration segments), alongside normal keys."""
    from datetime import datetime, timedelta

    from osm_pg_etl_spark.streaming.actions import capped_sessions

    t0 = datetime(2026, 1, 1)
    rows = []
    # bot: 5000 events, 1/minute -> one island, cap=120min -> 42 sessions
    for k in range(5000):
        rows.append((999, str(t0 + timedelta(minutes=k)), 1.0))
    # 10 normal users: 50 events each, 1/minute -> one 50-event session
    for u in range(10):
        for k in range(50):
            rows.append((u, str(t0 + timedelta(minutes=k)), 1.0))
    got = capped_sessions(_ev(spark, rows), gap_minutes=30,
                          max_duration_minutes=120).collect()
    bot = sorted((str(r["session_start"]), r["n_events"])
                 for r in got if r["user_id"] == 999)
    assert len(bot) == 42
    assert [n for _, n in bot] == [120] * 41 + [80]
    assert bot[0][0] == "2026-01-01 00:00:00"
    assert bot[41][0] == str(t0 + timedelta(minutes=41 * 120))
    normal = [(r["user_id"], r["n_events"])
              for r in got if r["user_id"] != 999]
    assert sorted(normal) == [(u, 50) for u in range(10)]


def test_capped_sessions_streaming_stateful(spark):
    """applyInPandasWithState path: batch 2's late event closes batch 1's
    session, which is then emitted."""
    from osm_pg_etl_spark.streaming.actions import capped_sessions

    # state-store maintenance may still touch checkpoint files after stop
    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as tmp:
        src = os.path.join(tmp, "events")
        os.makedirs(src)
        # plain parquet FILES (df.write makes directories, which a flat
        # readStream source ignores); µs timestamps to match the schema
        import pyarrow as pa
        import pyarrow.parquet as pq

        def write_file(df, name):
            pq.write_table(pa.Table.from_pandas(df.toPandas()),
                           os.path.join(src, name), coerce_timestamps="us")

        b1 = _ev(spark, [(1, "2026-01-01 00:00:00", 1.0),
                         (1, "2026-01-01 00:10:00", 2.0)])
        write_file(b1, "b1.parquet")
        b2 = _ev(spark, [(1, "2026-01-01 01:00:00", 5.0)])
        write_file(b2, "b2.parquet")

        stream = (spark.readStream.schema(b1.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        out = capped_sessions(stream)
        # NOT availableNow: with ProcessingTimeTimeout registered, the
        # trigger loops on "cleaning up state" until timeouts fire and
        # never terminates; process what's there, assert, stop.
        q = (out.writeStream.format("memory").queryName("caps")
             .outputMode("append")
             .option("checkpointLocation", os.path.join(tmp, "ck"))
             .start())
        import time

        try:
            # poll the sink: the state-cleanup trigger never quiesces, so
            # processAllAvailable()/awaitTermination would block forever
            deadline = time.monotonic() + 120
            got = []
            while time.monotonic() < deadline and not got:
                time.sleep(2)
                got = sorted((r["user_id"], str(r["session_start"]),
                              r["n_events"], r["sum_value"])
                             for r in spark.table("caps").collect())
        finally:
            q.stop()
        # the 00:00 session (2 events, sum 3.0) was closed by the 01:00
        # event; the 01:00 session is still open in state -> not emitted
        assert got == [(1, "2026-01-01 00:00:00", 2, 3.0)]


def test_interval_join_batch(spark):
    from osm_pg_etl_spark.streaming.actions import interval_join

    mk = lambda rows: spark.createDataFrame(
        rows, "ts string, user_id long, value double"
    ).withColumn("ts", F.to_timestamp("ts").cast("timestamp_ntz"))
    clicks = mk([("2026-01-01 00:00:00", 1, 10.0),
                 ("2026-01-01 01:00:00", 1, 11.0),
                 ("2026-01-01 00:00:00", 2, 20.0)])
    buys = mk([("2026-01-01 00:05:00", 1, 1.0),    # within 10m of click 1
               ("2026-01-01 00:20:00", 1, 2.0),    # outside
               ("2026-01-01 00:09:00", 3, 3.0)])   # other user
    got = interval_join(clicks, buys, within="10 minutes").collect()
    assert len(got) == 1
    r = got[0]
    assert (r["user_id"], r["l_value"], r["r_value"], r["gap_s"]) \
        == (1, 10.0, 1.0, 300.0)


def test_interval_join_streaming_matches_batch(spark):
    from osm_pg_etl_spark.streaming.actions import interval_join

    with tempfile.TemporaryDirectory() as tmp:
        rows_l = [("2026-01-01 00:00:00", 1, 1.0),
                  ("2026-01-01 02:00:00", 1, 2.0),
                  ("2026-01-01 02:00:00", 2, 3.0)]
        rows_r = [("2026-01-01 00:04:00", 1, 9.0),
                  ("2026-01-01 02:07:00", 1, 8.0),
                  ("2026-01-01 02:30:00", 2, 7.0)]
        mk = lambda rows: spark.createDataFrame(
            rows, "ts string, user_id long, value double"
        ).withColumn("ts", F.to_timestamp("ts").cast("timestamp_ntz"))
        left, right = mk(rows_l), mk(rows_r)
        left.write.parquet(os.path.join(tmp, "l"))
        right.write.parquet(os.path.join(tmp, "r"))
        sl = spark.readStream.schema(left.schema).parquet(os.path.join(tmp, "l"))
        sr = spark.readStream.schema(right.schema).parquet(os.path.join(tmp, "r"))
        out = interval_join(sl, sr, within="10 minutes")
        q = (out.writeStream.format("memory").queryName("ij")
             .outputMode("append")
             .option("checkpointLocation", os.path.join(tmp, "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        stream_got = {(r["user_id"], r["l_value"], r["r_value"], r["gap_s"])
                      for r in spark.table("ij").collect()}
        batch_got = {(r["user_id"], r["l_value"], r["r_value"], r["gap_s"])
                     for r in interval_join(left, right,
                                            within="10 minutes").collect()}
        assert stream_got == batch_got == {(1, 1.0, 9.0, 240.0),
                                           (1, 2.0, 8.0, 420.0)}


def test_enriched_window_counts_stream_matches_batch(spark):
    import os
    import tempfile

    from osm_pg_etl_spark.streaming.actions import enriched_window_counts

    events = spark.createDataFrame(
        [("2026-01-01 00:10:00", 1, 1.0),
         ("2026-01-01 00:20:00", 2, 2.0),
         ("2026-01-01 01:10:00", 1, 4.0)],
        "ts string, user_id long, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    dim = spark.createDataFrame(
        [(1, "MACHINERY"), (2, "HOUSEHOLD")],
        "c_custkey long, c_mktsegment string")

    batch = {(str(r["window_start"]), r["c_mktsegment"]):
             (r["n_events"], r["sum_value"])
             for r in enriched_window_counts(events, dim).collect()}
    assert batch == {
        ("2026-01-01 00:00:00", "MACHINERY"): (1, 1.0),
        ("2026-01-01 00:00:00", "HOUSEHOLD"): (1, 2.0),
        ("2026-01-01 01:00:00", "MACHINERY"): (1, 4.0),
    }

    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "events")
        events.write.parquet(src)
        stream = spark.readStream.schema(events.schema).parquet(src)
        out = enriched_window_counts(stream, dim)
        q = (out.writeStream.format("memory").queryName("enrich")
             .outputMode("complete")
             .option("checkpointLocation", os.path.join(tmp, "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = {(str(r["window_start"]), r["c_mktsegment"]):
               (r["n_events"], r["sum_value"])
               for r in spark.table("enrich").collect()}
        assert got == batch


def test_interval_join_left_outer_stream_plan_and_batch(spark):
    import os
    import tempfile

    from osm_pg_etl_spark.streaming.actions import interval_join

    clicks = spark.createDataFrame(
        [(7, "2026-01-01 00:10:00", 1.0),   # converts at +5 min
         (7, "2026-01-01 02:00:00", 2.0),   # never converts
         (8, "2026-01-01 00:12:00", 3.0)],  # other user, no purchase
        "user_id long, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    buys = spark.createDataFrame(
        [(7, "2026-01-01 00:15:00", 9.0)],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))

    batch = interval_join(clicks, buys, how="left_outer").collect()
    rows = {(r["user_id"], str(r["l_ts"])): (r["r_value"], r["gap_s"])
            for r in batch}
    assert rows[(7, "2026-01-01 00:10:00")] == (9.0, 300.0)
    assert rows[(7, "2026-01-01 02:00:00")] == (None, None)
    assert rows[(8, "2026-01-01 00:12:00")] == (None, None)

    with tempfile.TemporaryDirectory() as tmp:
        lsrc, rsrc = os.path.join(tmp, "l"), os.path.join(tmp, "r")
        clicks.write.parquet(lsrc)
        buys.write.parquet(rsrc)
        lstream = spark.readStream.schema(clicks.schema).parquet(lsrc)
        rstream = spark.readStream.schema(buys.schema).parquet(rsrc)
        out = interval_join(lstream, rstream, how="left_outer",
                            watermark="30 minutes")
        q = (out.writeStream.format("memory").queryName("ij_outer")
             .outputMode("append")
             .option("checkpointLocation", os.path.join(tmp, "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = spark.table("ij_outer").collect()
        # the matched pair emits in the first batch; NULL rows wait for
        # the watermark to close (a later batch) — the contract under test
        # is that the outer streaming plan runs end-to-end and the matched
        # row is correct
        matched = {(r["user_id"], r["r_value"]) for r in got
                   if r["r_value"] is not None}
        assert matched == {(7, 9.0)}
