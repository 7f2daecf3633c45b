"""Tag-map (hstore-equivalent) column expressions — SURVEY §2.2 P1-P3, F21.

The reference stores OSM tags as PostgreSQL ``hstore``; here they are a
``map<string,string>`` column. All three hstore operators it uses map to
built-in Spark functions (JVM-side, codegen-friendly — no UDFs):

- ``tags -> 'k'``   (value or NULL)        → :func:`tag_get`
- ``tags ? 'k'``    (key exists)           → :func:`tag_has`
- ``each(tags)``    (set-returning expand) → :func:`explode_tags`
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tag_get(tags: Column | str, key: str) -> Column:
    """``tags -> 'key'``: value for key, NULL when absent.

    Reference usage: ``osm-explore.sql:11``, ``osm-road-graphs.sql:11-12``.
    """
    return F.element_at(_col(tags), key)


def tag_has(tags: Column | str, key: str) -> Column:
    """``tags ? 'key'``: boolean key-membership.

    Reference usage: ``osm-explore.sql:14,25,47``. NULL maps yield NULL,
    which filters falsy — same as hstore on NULL rows.
    """
    return F.map_contains_key(_col(tags), key)


def explode_tags(df: DataFrame, tags_col: str = "tags",
                 key_alias: str = "tag", value_alias: str = "value") -> DataFrame:
    """``each(tags)``: one row per (key, value) pair (``osm-explore.sql:23,45``).

    Rows with NULL/empty maps produce no output, matching ``each``.
    """
    return df.select("*", F.explode(F.col(tags_col)).alias(key_alias, value_alias))
