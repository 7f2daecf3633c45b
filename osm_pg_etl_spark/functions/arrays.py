"""Array helpers — SURVEY §2.8 F1-F5, §2.2 P8.

All pure Column expressions over built-ins; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def get_ints_from_text(s: Column | str) -> Column:
    """Port of ``get_ints_from_text(text) → int[]``
    (``general-functions.sql:3-5``): regex-split on runs of non-digits, drop
    empty tokens, cast to int. ``'50 mph; 60'`` → ``[50, 60]``.

    NULL input → NULL (the reference UDF is STRICT-by-default SQL, same).
    """
    toks = F.split(_col(s), "[^0-9]+")
    return F.transform(F.filter(toks, lambda x: x != ""), lambda x: x.cast("int"))


def first_int(s: Column | str) -> Column:
    """``(get_ints_from_text(x))[1]`` (``osm-road-graphs.sql:11``): first
    integer in the string, NULL when none. Compiled to a single
    ``regexp_extract`` instead of building the whole array."""
    m = F.regexp_extract(_col(s), "([0-9]+)", 1)
    return F.when(m != "", m.cast("int"))


def array_first(a: Column | str) -> Column:
    """``a[1]`` (``osm-road-graphs.sql:10``): first element."""
    return F.element_at(_col(a), 1)


def array_last(a: Column | str) -> Column:
    """``a[array_upper(a,1)]`` (``osm-road-graphs.sql:10,155``): last element."""
    return F.element_at(_col(a), -1)


def array_reverse(a: Column | str) -> Column:
    """``array_reverse`` UDF (``general-functions.sql:36-42``) — built-in."""
    return F.reverse(_col(a))
