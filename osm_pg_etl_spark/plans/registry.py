"""Aggregated query/oracle registry consumed by ``__spark_entry__.py``.

The driver verifies at most ~50 ``queries()`` entries per round, in dict
order.  ``all_queries`` therefore orders queries by *verification need*:
anything without an all-green row in a past ``CORRECTNESS_r*.json`` (never
run, failed, or new this round) comes first, so the hard driver signal
always lands on the least-verified surface.  Already-green queries keep
their relative order after the priority block.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from . import datapipe, osm_derived, relational

QueryFn = Callable[[SparkSession, str], DataFrame]

_REPO_ROOT = Path(__file__).resolve().parents[2]


def _driver_green() -> set[str]:
    """Query names with an all-green row in any past driver correctness file."""
    green: set[str] = set()
    try:
        for path in sorted(_REPO_ROOT.glob("CORRECTNESS_r*.json")):
            for name, row in json.loads(path.read_text()).items():
                if (
                    isinstance(row, dict)
                    and row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match") is not False
                    and not row.get("err")
                ):
                    green.add(name)
    except (OSError, ValueError):  # unreadable/malformed files: no reorder
        return set()
    return green


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for mod in (relational, osm_derived, datapipe):
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    green = _driver_green()
    return {
        name: out[name]
        for name in sorted(out, key=lambda n: (n in green, list(out).index(n)))
    }


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in (relational, osm_derived, datapipe):
        out.update(mod.ORACLES)
    return out
