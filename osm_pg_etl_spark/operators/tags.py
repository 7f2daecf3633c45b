"""Tag exploration summaries — osm-explore.sql parity (SURVEY §2.4 A1-A2,
§2.2 P1-P7, §2.6 O1).

``osm-explore.sql`` materializes ~24 group-by-count tables over the hstore
tag column. All of them are instances of three shapes, parameterized here.
Each returns an ordered DataFrame; persistence is the caller's choice
(sources.io.materialize / write_table ≙ CTAS).

Scale: these are classic map-side-combinable aggregations — partial
HashAggregate before the shuffle means the shuffle carries only distinct
(key, partial-count) pairs, so they hold at 100 TB as long as tag
cardinality (not row count) bounds the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.maps import tag_get, tag_has

# osm-explore.sql:49-53 — noisy keys excluded from the key frequency table
DEFAULT_KEY_DENYLIST = ("created_by", "source")
DEFAULT_KEY_SUBSTRING_DENYLIST = ("name", "source", "tiger", "gns")


def tag_value_summary(entities: DataFrame, key: str) -> DataFrame:
    """``CREATE TABLE ..._values AS SELECT tags->'k' AS value, count(*) ...
    WHERE tags ? 'k' GROUP BY 1 ORDER BY count DESC`` (``osm-explore.sql:9-16``)."""
    return (entities
            .filter(tag_has("tags", key))
            .groupBy(tag_get("tags", key).alias("value"))
            .agg(F.count(F.lit(1)).alias("count"))
            .orderBy(F.desc("count"), "value"))


def tag_key_summary(entities: DataFrame,
                    denylist: tuple[str, ...] = DEFAULT_KEY_DENYLIST,
                    substring_denylist: tuple[str, ...] = DEFAULT_KEY_SUBSTRING_DENYLIST,
                    ) -> DataFrame:
    """Key frequency over ``each(tags)`` with the reference's noise filters
    (``osm-explore.sql:42-56``): literal NOT IN (P7) plus
    ``position(x in tag) = 0`` substring exclusions (P6)."""
    keys = entities.select(F.explode(F.map_keys("tags")).alias("tag"))
    cond = ~F.col("tag").isin(list(denylist))
    for sub in substring_denylist:
        cond = cond & (F.instr(F.col("tag"), sub) == 0)
    return (keys.filter(cond)
            .groupBy("tag").agg(F.count(F.lit(1)).alias("count"))
            .orderBy(F.desc("count"), "tag"))


def tag_kv_summary(entities: DataFrame) -> DataFrame:
    """(key, value) frequency over ``each(tags)`` (``osm-explore.sql:20-29``)."""
    return (entities
            .select(F.explode("tags").alias("tag", "value"))
            .groupBy("tag", "value").agg(F.count(F.lit(1)).alias("count"))
            .orderBy(F.desc("count"), "tag", "value"))


def tag_cross_summary(entities: DataFrame, key_a: str, key_b: str) -> DataFrame:
    """Two-key crosstab, e.g. ``GROUP BY highway, oneway``
    (``osm-explore.sql:82-91``; ``osm-road-graphs.sql:33-40``)."""
    return (entities
            .filter(tag_has("tags", key_a))
            .groupBy(tag_get("tags", key_a).alias(key_a),
                     tag_get("tags", key_b).alias(key_b))
            .agg(F.count(F.lit(1)).alias("count"))
            .orderBy(F.desc("count"), key_a))
