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


def tag_value_summary(entities: DataFrame, key: str,
                      alias: str | None = None,
                      ordered: bool = True) -> DataFrame:
    """``CREATE TABLE ..._values AS SELECT tags->'k' AS value, count(*) ...
    WHERE tags ? 'k' GROUP BY 1 ORDER BY count DESC`` (``osm-explore.sql:9-16``).
    ``alias`` names the value column (the reference names it after the key,
    e.g. ``highway``)."""
    alias = alias or "value"
    out = (entities
           .filter(tag_has("tags", key))
           .groupBy(tag_get("tags", key).alias(alias))
           .agg(F.count(F.lit(1)).alias("count")))
    return out.orderBy(F.desc("count"), alias) if ordered else out


def tag_key_summary(entities: DataFrame,
                    denylist: tuple[str, ...] = DEFAULT_KEY_DENYLIST,
                    substring_denylist: tuple[str, ...] = DEFAULT_KEY_SUBSTRING_DENYLIST,
                    ordered: bool = True) -> DataFrame:
    """Key frequency over ``each(tags)`` with the reference's noise filters
    (``osm-explore.sql:42-56``): literal NOT IN (P7) plus
    ``position(x in tag) = 0`` substring exclusions (P6)."""
    keys = entities.select(F.explode(F.map_keys("tags")).alias("tag"))
    cond = ~F.col("tag").isin(list(denylist)) if denylist else F.lit(True)
    for sub in substring_denylist:
        cond = cond & (F.instr(F.col("tag"), sub) == 0)
    out = (keys.filter(cond)
           .groupBy("tag").agg(F.count(F.lit(1)).alias("count")))
    return out.orderBy(F.desc("count"), "tag") if ordered else out


def tag_kv_summary(entities: DataFrame,
                   denylist: tuple[str, ...] = (),
                   substring_denylist: tuple[str, ...] = (),
                   ordered: bool = True) -> DataFrame:
    """(key, value) frequency over ``each(tags)`` (``osm-explore.sql:20-29``),
    with the optional key exclusions of ``highway_tags_values``
    (``osm-explore.sql:43-57``: literal NOT IN + substring ``position = 0``)."""
    kv = entities.select(F.explode("tags").alias("tag", "value"))
    cond = F.lit(True)
    if denylist:
        cond = ~F.col("tag").isin(list(denylist))
    for sub in substring_denylist:
        cond = cond & (F.instr(F.col("tag"), sub) == 0)
    out = (kv.filter(cond)
           .groupBy("tag", "value").agg(F.count(F.lit(1)).alias("count")))
    return out.orderBy(F.desc("count"), "tag", "value") if ordered else out


def tag_cross_summary(entities: DataFrame, key_a: str, key_b: str,
                      require_both: bool = False,
                      ordered: bool = True) -> DataFrame:
    """Two-key crosstab, e.g. ``GROUP BY highway, oneway``
    (``osm-explore.sql:82-91``; ``osm-road-graphs.sql:33-40``).
    ``require_both=True`` matches ``highway_oneway_values``, which filters
    on *both* ``tags ? 'oneway'`` and ``tags ? 'highway'``."""
    cond = tag_has("tags", key_a)
    if require_both:
        cond = cond & tag_has("tags", key_b)
    out = (entities
           .filter(cond)
           .groupBy(tag_get("tags", key_a).alias(key_a),
                    tag_get("tags", key_b).alias(key_b))
           .agg(F.count(F.lit(1)).alias("count")))
    return out.orderBy(F.desc("count"), key_a) if ordered else out


def tag_value_where_summary(entities: DataFrame, select_key: str,
                            where_key: str, where_value: str,
                            alias: str | None = None,
                            ordered: bool = True) -> DataFrame:
    """``highway_service`` shape (``osm-explore.sql:32-40``): the values of
    one tag over entities where another tag has a given value. NO presence
    filter on ``select_key`` — entities without it contribute a NULL group,
    exactly like the reference's ``tags -> 'service'`` projection. The value
    column is named after ``select_key`` (the reference names it
    ``service``), matching every other catalog table's key-named column."""
    alias = alias or select_key
    out = (entities
           .filter(tag_get("tags", where_key) == where_value)
           .groupBy(tag_get("tags", select_key).alias(alias))
           .agg(F.count(F.lit(1)).alias("count")))
    return out.orderBy(F.desc("count"), alias) if ordered else out


# osm-explore.sql:52-56 — key exclusions of highway_tags_values
HIGHWAY_TAGS_DENYLIST = ("created_by", "wikidata", "width", "wikipedia",
                         "note", "old_ref", "length", "description")
HIGHWAY_TAGS_SUBSTRING_DENYLIST = ("name", "source", "destination", "addr")

# the POI keys each entity kind is summarized by (osm-explore.sql:96-247)
POI_NODE_KEYS = ("amenity", "shop", "leisure", "craft", "sport", "tourism",
                 "office")
POI_WAY_KEYS = ("amenity", "sport", "leisure", "landuse")
POI_RELATION_KEYS = ("amenity", "leisure", "sport", "landuse")


def tags_summary_catalog(nodes: DataFrame, ways: DataFrame,
                         relations: DataFrame | None = None,
                         ordered: bool = True) -> dict[str, DataFrame]:
    """The complete ``tags_summary`` schema of ``osm-explore.sql:5-247`` in
    one call: every named table, faithful to its exact filter/projection
    (presence filters, the service NULL group, the two-key oneway filter,
    the highway_tags_values denylists). Returns name → DataFrame in the
    script's order; register with ``catalog.register_tags_summary`` or
    materialize with ``sources.io.write_table`` (CTAS).

    Relation tables are built only when ``relations`` is given (the script
    assumes a full pgsnapshot load). All outputs are map-side-combinable
    aggregations — the catalog is ~24 independent small shuffles, safe to
    build in one job at any scale.

    ``ordered=False`` skips each table's count-DESC presentation sort:
    every sort is a full extra stage barrier, pure waste when the consumer
    re-sorts, unions, or hashes the result (CTAS materialization, the
    explore-summary gate) — the reference's ORDER BY is presentation, not
    semantics."""
    hw_ways = ways.filter(tag_has("tags", "highway"))
    cat: dict[str, DataFrame] = {
        "highway_values": tag_value_summary(ways, "highway", alias="highway",
                                            ordered=ordered),
        "highway_other_tags": tag_key_summary(hw_ways, (), (),
                                              ordered=ordered),
        "highway_service": tag_value_where_summary(
            ways, "service", "highway", "service", ordered=ordered),
        "highway_tags_values": tag_kv_summary(
            hw_ways, HIGHWAY_TAGS_DENYLIST, HIGHWAY_TAGS_SUBSTRING_DENYLIST,
            ordered=ordered),
        "railway_ways_values": tag_value_summary(
            ways, "railway", alias="railway", ordered=ordered),
        "railway_nodes_values": tag_value_summary(
            nodes, "railway", alias="railway", ordered=ordered),
        "highway_oneway_values": tag_cross_summary(
            ways, "highway", "oneway", require_both=True, ordered=ordered),
    }
    for key in POI_NODE_KEYS:
        cat[f"{key}_nodes_values"] = tag_value_summary(nodes, key, alias=key,
                                                       ordered=ordered)
    for key in POI_WAY_KEYS:
        cat[f"{key}_ways_values"] = tag_value_summary(ways, key, alias=key,
                                                      ordered=ordered)
    if relations is not None:
        for key in POI_RELATION_KEYS:
            cat[f"{key}_relations_values"] = tag_value_summary(
                relations, key, alias=key, ordered=ordered)
    return cat
