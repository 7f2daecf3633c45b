"""Deterministic, engine-portable hashes.

Spark's ``hash()``/``xxhash64()`` are murmur3/xxhash and do not match any
DuckDB builtin, so oracle-checkable operators (dedup, MinHash, SimHash) use
md5-derived integers instead: ``conv(substr(md5(x),1,8),16,10)`` here equals
``('0x' || substr(md5(x),1,8))::bigint`` in ANSI-ish SQL. md5 is a few ns
per row slower than murmur3 but keeps every hash reproducible across engines
and across Spark versions — worth it for lineage-stable dedup keys at scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def md5_hex(c: Column | str) -> Column:
    """Full 128-bit md5 as 32 hex chars — exact-dedup fingerprint key."""
    return F.md5(_col(c).cast("string"))


def md5_long(c: Column | str, seed: int = 0) -> Column:
    """32-bit unsigned int derived from md5(seed||x), as a long.

    A family of hash functions indexed by ``seed`` (for MinHash rows /
    SimHash bit draws). Portable: equivalent SQL is
    ``('0x' || substr(md5(seed || x), 1, 8))::bigint``.
    """
    base = _col(c).cast("string")
    if seed:
        base = F.concat(F.lit(f"{seed}|"), base)
    return F.conv(F.substring(F.md5(base), 1, 8), 16, 10).cast("long")
