"""hstore ⇄ MapType bridging — the type conversion both Postgres legs
need (the reference's pgsnapshot schema stores OSM tags as hstore;
this engine stores them as ``map<string,string>``).

- :func:`hstore_literal` (Spark → PG): a pure Column expression building
  the hstore input literal ``"k"=>"v","k2"=>NULL`` with backslash/quote
  escaping — JVM-side, usable in any projection feeding the COPY/JDBC
  sinks.
- :func:`parse_hstore` (PG → Spark): an Arrow-batched ``pandas_udf``
  tokenizer for hstore's text OUTPUT format (always-quoted keys/values,
  ``\\"`` and ``\\\\`` escapes, unquoted NULL). A UDF is the honest tool
  here: the quoted-escape grammar is not expressible with one regex pass
  per group (an escaped quote ends a naive match; ``""`` vs NULL are
  distinct), and parsing runs once at ingest, not in the hot path.

Round-trip identity (literal → hstore → output → parse) is pinned by
``tests/test_pg_copy.py`` property tests and exercised against a REAL
server by ``tests/test_pg_reference_parity.py``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import MapType, StringType


def hstore_literal(tags_col: Column | str) -> Column:
    """Build a PostgreSQL hstore input literal from a MapType column."""
    col = F.col(tags_col) if isinstance(tags_col, str) else tags_col

    def esc(c: Column) -> Column:
        return F.replace(F.replace(c, F.lit("\\"), F.lit("\\\\")),
                         F.lit('"'), F.lit('\\"'))

    def entry(e: Column) -> Column:
        return F.concat(
            F.lit('"'), esc(e["key"]), F.lit('"=>'),
            F.when(e["value"].isNull(), F.lit("NULL"))
            .otherwise(F.concat(F.lit('"'), esc(e["value"]), F.lit('"'))))

    return F.array_join(F.transform(F.map_entries(col), entry), ",")


def _parse_one(s: str | None) -> dict | None:
    """Tokenize one hstore OUTPUT string: ``"k"=>"v", "k2"=>NULL``.
    Keys/values are always quoted on output; ``\\"`` and ``\\\\`` escape
    inside quotes; NULL is the unquoted keyword."""
    if s is None:
        return None
    out: dict[str, str | None] = {}
    i, n = 0, len(s)

    def read_quoted(j: int) -> tuple[str, int]:
        assert s[j] == '"', f"expected quote at {j} in {s!r}"
        j += 1
        buf = []
        while j < n:
            ch = s[j]
            if ch == "\\" and j + 1 < n:
                buf.append(s[j + 1])
                j += 2
            elif ch == '"':
                return "".join(buf), j + 1
            else:
                buf.append(ch)
                j += 1
        raise ValueError(f"unterminated quote in hstore output: {s!r}")

    while i < n:
        while i < n and s[i] in " ,\t\n":
            i += 1
        if i >= n:
            break
        key, i = read_quoted(i)
        if s[i:i + 2] != "=>":
            raise ValueError(f"expected => at {i} in {s!r}")
        i += 2
        while i < n and s[i] == " ":
            i += 1
        if s[i:i + 4] == "NULL" and (i + 4 == n or s[i + 4] in " ,"):
            out[key] = None
            i += 4
        else:
            out[key], i = read_quoted(i)
    return out


@pandas_udf(MapType(StringType(), StringType()))
def parse_hstore(col: pd.Series) -> pd.Series:
    """hstore text output → ``map<string,string>`` (NULL-valued keys
    preserved; NULL input → NULL map)."""
    return col.map(_parse_one, na_action="ignore")
