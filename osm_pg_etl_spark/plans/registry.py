"""Aggregated query/oracle registry consumed by ``__spark_entry__.py``.

The driver verifies at most ~50 ``queries()`` entries per round, in dict
order.  ``all_queries`` therefore orders queries by *verification need*:
anything without an all-green row in a past ``CORRECTNESS_r*.json`` (never
run, failed, or new this round) comes first, then green queries ordered by
the *staleness* of their most recent green row (oldest round first).  With
an N-query surface and a 50-row budget, every query is re-verified against
current code at most every ceil(N/50) rounds instead of a green row from an
early round shielding a query from re-verification forever.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from . import datapipe, osm_derived, relational

QueryFn = Callable[[SparkSession, str], DataFrame]

_REPO_ROOT = Path(__file__).resolve().parents[2]


def _green_rounds() -> dict[str, int]:
    """Latest round number with an all-green driver row, per query name."""
    rounds: dict[str, int] = {}
    try:
        for path in sorted(_REPO_ROOT.glob("CORRECTNESS_r*.json")):
            try:
                rnd = int(path.stem.rsplit("_r", 1)[-1])
            except ValueError:
                rnd = 0
            for name, row in json.loads(path.read_text()).items():
                if (
                    isinstance(row, dict)
                    and row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match") is not False
                    and not row.get("err")
                ):
                    rounds[name] = max(rounds.get(name, 0), rnd)
    except (OSError, ValueError):  # unreadable/malformed files: no reorder
        return {}
    return rounds


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for mod in (relational, osm_derived, datapipe):
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    green = _green_rounds()
    order = {name: i for i, name in enumerate(out)}
    return {
        name: out[name]
        for name in sorted(
            out, key=lambda n: (n in green, green.get(n, 0), order[n]))
    }


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in (relational, osm_derived, datapipe):
        out.update(mod.ORACLES)
    return out
