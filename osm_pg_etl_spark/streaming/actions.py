"""Change-feed maintenance — the reference's only incremental surface
(SURVEY §2.1 S9, §2.9): the ``actions`` table
(``etl/pgsnapshot_schema_0.6_action.sql:8-12``) records one row per changed
entity per replication changeset (``data_type`` N/W/R, ``action`` C/M/D),
and the ``osmosisUpdate()`` hook (``etl/pgsnapshot_schema_0.6.sql:140-144``)
lets user code incrementally maintain derived tables inside the same
transaction.

Spark analog: ``apply_actions`` merges one changeset batch into an entity
snapshot (the batch MERGE), and ``incremental_pipeline`` is the
``osmosisUpdate`` hook — a Structured Streaming ``foreachBatch`` loop over a
change-log directory that re-derives downstream tables from the updated
snapshot. Re-derivation recomputes only what the batch touches when the
snapshot is partitioned on the join keys; v1 recomputes the derived table
(correct first, incremental refinement is a planned optimization).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DATA_TYPES = {"N": "nodes", "W": "ways", "R": "relations"}


def apply_actions(snapshot: DataFrame, actions: DataFrame,
                  changed_rows: DataFrame, data_type: str,
                  id_col: str = "id") -> DataFrame:
    """Merge one changeset into an entity snapshot.

    - ``actions``: the change feed (data_type, action, id) for this batch.
    - ``changed_rows``: full new rows for created/modified ids (the
      replication payload Osmosis would have written).

    Semantics of the pgsnapshot feed: C=create, M=modify, D=delete, one row
    per entity per changeset. Expressed as anti-join (drop every touched
    id) + union of the C/M payload — the standard shuffle-bounded MERGE.
    On Delta/Iceberg this maps 1:1 to ``MERGE INTO``.
    """
    acted = (actions.filter(F.col("data_type") == data_type)
             .select(F.col("id").alias(id_col)).distinct())
    upserts = changed_rows.join(
        actions.filter((F.col("data_type") == data_type)
                       & F.col("action").isin("C", "M"))
        .select(F.col("id").alias(id_col)).distinct(),
        id_col, "left_semi")
    return snapshot.join(acted, id_col, "left_anti").unionByName(upserts)


def incremental_pipeline(spark, changes_path: str, checkpoint_path: str,
                         on_batch: Callable[[DataFrame, int], None],
                         schema=None):
    """``osmosisUpdate()`` analog: a Structured Streaming file source over a
    change-log directory; ``on_batch(batch_df, batch_id)`` plays the hook
    body and runs inside ``foreachBatch`` (exactly-once per batch with the
    checkpoint, mirroring "called within the same transaction",
    ``etl/pgsnapshot_schema_0.6.sql:139-143``)."""
    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    stream = reader.parquet(changes_path)
    return (stream.writeStream
            .foreachBatch(on_batch)
            .option("checkpointLocation", checkpoint_path)
            .trigger(availableNow=True)
            .start())


def session_counts(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Per-user session aggregation via the built-in ``session_window``
    (extension; SURVEY §2.9 — the reference has no event-time operators).
    Two events share a session iff consecutive gaps stay under ``gap``.
    Works on batch and streaming inputs alike; on a stream the watermark
    bounds session state."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum(F.col("value").cast("decimal(20,6)")).cast("double"), 4)
                 .alias("sum_value"))
            .select("user_id", F.col("w.start").alias("session_start"),
                    "n_events", "sum_value"))


def capped_sessions(events: DataFrame, gap_minutes: int = 30,
                    max_duration_minutes: int = 120,
                    watermark: str = "2 hours") -> DataFrame:
    """Custom stateful sessionization the built-in window can't express:
    sessions close on a ``gap_minutes`` silence OR when they reach
    ``max_duration_minutes`` total span (training-pipeline style bounded
    sessions).

    Semantics (identical on both paths *for per-key in-order arrival*):
    events group into gap-islands; an island splits into sessions at fixed
    ``max_duration`` boundaries measured from the island's first event.

    Streaming input → ``applyInPandasWithState`` (per-key state = current
    island/session accumulator, processing-time timeout flushes idle
    keys). Batch input → the equivalent two-pass window computation, so
    the operator is testable and oracle-checkable without a streaming
    runtime.

    In-order assumption (streaming path): events are sorted within each
    micro-batch, but an event admitted by the watermark that is *older
    than the key's state* (``ts < last_ts`` across batches) is folded into
    the open session as if it were current — the gap test sees a negative
    delta and never closes, while the batch path would have sorted it into
    place. Feed per-key ordered streams (e.g. Kafka key-partitioned) or
    accept batch/streaming divergence on cross-batch late data.

    Hot-key contract (a bot user at 100× median volume): per-key *state*
    is O(1) — one open-session accumulator, never an event buffer. The
    per-trigger transient cost for a key is ~16 bytes × its events in
    that micro-batch: only the (ts, value) columns are extracted from the
    Arrow chunks and sorted as primitive arrays; the full-width pandas
    frame is never concatenated. The batch path is two sort-based windows
    keyed on ``user_id`` — a skewed key sort-spills rather than OOMs. A
    salted pre-split is deliberately NOT offered: gap-islands are a
    sequential per-key computation, and salting would sever islands at
    salt boundaries; if one key's per-trigger volume can exceed an
    executor even at 16 B/event, cut sessions upstream on an accepted
    boundary (e.g. per (user, day)) instead.
    """
    out_schema = ("user_id long, session_start timestamp_ntz, "
                  "n_events long, sum_value double")

    if not events.isStreaming:
        gap_s = gap_minutes * 60
        cap_s = max_duration_minutes * 60
        w = Window.partitionBy("user_id").orderBy("ts")
        # NTZ has no direct double cast; UTC session tz makes the hop exact
        sec = F.col("ts").cast("timestamp").cast("double")
        prev = F.lag(sec).over(w)
        new_island = (prev.isNull() | (sec - prev >= gap_s)).cast("int")
        island = F.sum(new_island).over(
            w.rowsBetween(Window.unboundedPreceding, 0))
        df = events.select("user_id", "ts", "value",
                           island.alias("_island"), sec.alias("_sec"))
        wi = Window.partitionBy("user_id", "_island").orderBy("ts")
        start = F.first("_sec").over(
            wi.rowsBetween(Window.unboundedPreceding, 0))
        seg = F.floor((F.col("_sec") - start) / cap_s)
        return (df.withColumn("_seg", seg)
                .groupBy("user_id", "_island", "_seg")
                .agg(F.min("ts").alias("session_start"),
                     F.count(F.lit(1)).alias("n_events"),
                     F.round(F.sum(F.col("value").cast("decimal(20,6)"))
                             .cast("double"), 4).alias("sum_value"))
                .select("user_id", "session_start", "n_events", "sum_value"))

    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.streaming.state import (  # noqa: PLC0415
        GroupState,
        GroupStateTimeout,
    )

    gap_s = gap_minutes * 60
    cap_s = max_duration_minutes * 60

    def fn(key, pdfs, state: GroupState):
        # state: (island_start, sess_start, last_epoch, n, total)
        sessions = []
        cur = list(state.get) if state.exists else None
        if state.hasTimedOut:
            if cur:
                sessions.append(cur)
            state.remove()
        else:
            # hot-key bound: keep only the two primitive columns per chunk
            # (16 B/event) — never a full-width concat of the micro-batch
            ts_parts, val_parts = [], []
            for chunk in pdfs:
                ts_parts.append(chunk["ts"].to_numpy(dtype="datetime64[ns]")
                                .astype("int64"))
                val_parts.append(chunk["value"].to_numpy(dtype="float64"))
            ts_ns = (np.concatenate(ts_parts) if ts_parts
                     else np.empty(0, dtype="int64"))
            vals = (np.concatenate(val_parts) if val_parts
                    else np.empty(0, dtype="float64"))
            for i in np.argsort(ts_ns, kind="stable"):
                e, val = float(ts_ns[i]) / 1e9, vals[i]
                if cur is None:
                    cur = [e, e, e, 0, 0.0]
                elif e - cur[2] >= gap_s:
                    sessions.append(cur)
                    cur = [e, e, e, 0, 0.0]
                elif (e - cur[0]) // cap_s != (cur[1] - cur[0]) // cap_s:
                    island = cur[0]
                    sessions.append(cur)
                    cur = [island, e, e, 0, 0.0]
                cur[2] = e
                cur[3] += 1
                cur[4] += float(val)
            if cur is not None:
                state.update(tuple(cur))
            state.setTimeoutDuration(gap_s * 1000)
        return iter([pd.DataFrame({
            "user_id": [key[0]] * len(sessions),
            "session_start": [pd.Timestamp(s[1], unit="s") for s in sessions],
            "n_events": [s[3] for s in sessions],
            "sum_value": [round(s[4], 4) for s in sessions],
        })])

    return (events.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                fn, out_schema,
                "island_ts double, start_ts double, last_ts double, "
                "n long, total double",
                "append", GroupStateTimeout.ProcessingTimeTimeout))


def dedup_events(events: DataFrame, key_cols: tuple[str, ...] = ("event_id",),
                 ts_col: str = "ts", watermark: str = "2 hours",
                 tiebreak: tuple[str, ...] = ("event_id",)) -> DataFrame:
    """Streaming deduplication — the streaming face of the dedup suite
    (operators.dedup): keep one row per key.

    - Streaming input: ``dropDuplicatesWithinWatermark`` keeps the
      first-*arriving* row per key and expires state past the watermark, so
      state is bounded — the only formulation that scales to an unbounded
      stream.
    - Batch input: the deterministic equivalent — first row by event time
      (then ``tiebreak``) via the A10 distinct-on pattern.
    """
    if events.isStreaming:
        return (events.withWatermark(ts_col, watermark)
                .dropDuplicatesWithinWatermark(list(key_cols)))
    from pyspark.sql import Window  # noqa: PLC0415

    w = Window.partitionBy(*key_cols).orderBy(ts_col, *tiebreak)
    return (events.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours",
                          slide: str | None = None) -> DataFrame:
    """Streaming-ready event-time window aggregate over the events stream
    (extension — the reference has no event-time operators, SURVEY §2.9).
    Tumbling by default; pass ``slide`` (< window) for sliding windows, where
    each event expands into window/slide overlapping buckets. Works
    identically on a batch DataFrame (watermark is a no-op) and a streaming
    one (late data beyond the watermark dropped)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (src.groupBy(F.window("ts", window, slide or window).alias("w"),
                        "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum(F.col("value").cast("decimal(20,6)")).cast("double"), 4)
                 .alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n_events", "sum_value"))


def enriched_window_counts(events: DataFrame, dim: DataFrame,
                           key: str = "user_id",
                           dim_key: str = "c_custkey",
                           attr: str = "c_mktsegment",
                           window: str = "1 hour",
                           watermark: str = "2 hours") -> DataFrame:
    """Stream-static enrichment join + windowed rollup: each event joins a
    *static* dimension table on ``key`` (the classic "enrich the click
    stream with the customer segment" step), then tumbling event-time
    counts per dimension attribute.

    A stream-static equi-join is stateless in Structured Streaming — the
    static side is simply re-planned into every micro-batch — and the
    small dimension is broadcast, so the streaming side is never shuffled
    by the join at all; the only stateful operator is the window aggregate
    behind the watermark. Identical plan shape on batch inputs.
    """
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if events.isStreaming:
        src = src.withWatermark("ts", watermark)
    d = dim.select(F.col(dim_key).alias(key), attr)
    joined = src.join(F.broadcast(d), key)
    return (joined.groupBy(F.window("ts", window).alias("w"),
                           attr)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum(F.col("value").cast("decimal(20,6)"))
                         .cast("double"), 4).alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), attr,
                    "n_events", "sum_value"))


def interval_join(left: DataFrame, right: DataFrame,
                  key: str = "user_id", ts_col: str = "ts",
                  within: str = "10 minutes",
                  watermark: str = "1 hour",
                  how: str = "inner") -> DataFrame:
    """Stream-stream (or batch) event-time interval join: pair each left
    event with every right event of the same ``key`` whose timestamp falls
    in ``[left.ts, left.ts + within]`` — the attribution/funnel primitive
    (click → purchase within 10 minutes).

    Streaming inputs get watermarks on both sides plus the time-range
    predicate, which is exactly what Structured Streaming needs to bound
    the join state (each side's buffer is garbage-collected once the other
    side's watermark passes the interval). On batch inputs the same
    equi+range condition plans as a sort-merge join with the range as a
    post-join filter — the J7 shape on timestamps.

    Returns the left row's key/ts/value plus the matched right ts/value and
    the gap in seconds.

    ``how="left_outer"`` keeps unmatched left events with NULL right
    columns — the "clicks that never converted" readout. In streaming
    mode Structured Streaming emits the NULL row only once the right
    side's watermark has passed the interval (it must prove no match can
    still arrive); the batch path is a plain LEFT JOIN with the same
    predicate.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be inner|left_outer, got {how!r}")
    n, unit = within.split()
    delta = F.expr(f"INTERVAL {n} {unit}")
    lt, rt = F.col(f"_l.{ts_col}"), F.col(f"_r.{ts_col}")
    if left.isStreaming or right.isStreaming:
        # watermarks demand TIMESTAMP (not NTZ); UTC session tz keeps the
        # instant identical to the batch path
        left = (left.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
                .withWatermark(ts_col, watermark))
        right = (right.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
                 .withWatermark(ts_col, watermark))
    cond = ((F.col(f"_l.{key}") == F.col(f"_r.{key}"))
            & (rt >= lt) & (rt <= lt + delta))
    joined = left.alias("_l").join(right.alias("_r"), cond, how)
    # NTZ has no direct double cast; UTC session tz makes the epoch exact
    lsec = lt.cast("timestamp").cast("double")
    rsec = rt.cast("timestamp").cast("double")
    return joined.select(
        F.col(f"_l.{key}").alias(key),
        lt.alias("l_ts"), F.col("_l.value").alias("l_value"),
        rt.alias("r_ts"), F.col("_r.value").alias("r_value"),
        (rsec - lsec).alias("gap_s"))
