"""POI extraction — ``osm-pois-extract.sql`` parity (SURVEY §2.1 S4, §2.7 U2).

The reference appends one slice per POI key into a long-format table
("must get and insert them per distinct key because there are main keys and
type keys", ``osm-pois-extract.sql:2``); a node carrying two POI keys
appears twice. Re-expressed as a single explode-and-filter over the tag map
— one narrow pass instead of K table scans, same output multiset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.maps import tag_get

# osm-pois-extract.sql:3-48
POI_NODE_KEYS = ("leisure", "sport", "shop", "office", "amenity", "craft",
                 "tourism", "emergency", "historic")
# osm-pois-extract.sql:50-71
POI_WAY_KEYS = ("leisure", "landuse", "sport", "amenity")


def pois_from_nodes(nodes: DataFrame,
                    keys: tuple[str, ...] = POI_NODE_KEYS) -> DataFrame:
    """``graphs.pois_nodes``: one row per (node, poi-key) where the key is
    present. Equivalent to the reference's per-key INSERT…SELECT chain but
    as one scan: explode a literal key array, keep hits."""
    key_arr = F.array(*[F.lit(k) for k in keys])
    return (nodes
            .select(F.col("id").alias("node_id"),
                    F.struct(F.col("lon"), F.col("lat")).alias("geom"),
                    F.explode(key_arr).alias("key"),
                    F.col("tags"))
            .withColumn("values", F.element_at("tags", F.col("key")))
            .filter(F.col("values").isNotNull())
            .select("node_id", "geom", "key", "values",
                    tag_get("tags", "name").alias("name"), "tags"))


def pois_from_ways(ways: DataFrame,
                   keys: tuple[str, ...] = POI_WAY_KEYS) -> DataFrame:
    """``graphs.pois_ways`` (``osm-pois-extract.sql:50-71``): same long
    format over ways, excluding highway-tagged ways in every slice."""
    key_arr = F.array(*[F.lit(k) for k in keys])
    return (ways
            .filter(tag_get("tags", "highway").isNull())
            .select(F.col("id").alias("way_id"),
                    F.col("linestring").alias("geom"),
                    F.explode(key_arr).alias("key"),
                    F.col("tags"))
            .withColumn("values", F.element_at("tags", F.col("key")))
            .filter(F.col("values").isNotNull())
            .select("way_id", "geom", "key", "values",
                    tag_get("tags", "name").alias("name"), "tags"))
