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

from pyspark.sql import DataFrame
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


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Streaming-ready tumbling-window aggregate over the events stream
    (extension — the reference has no event-time operators, SURVEY §2.9).
    Works identically on a batch DataFrame (watermark is a no-op) and a
    streaming one (late data beyond the watermark dropped)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (src.groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum(F.col("value").cast("decimal(20,6)")).cast("double"), 4)
                 .alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n_events", "sum_value"))
