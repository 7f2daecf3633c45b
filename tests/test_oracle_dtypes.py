"""Oracle-SQL dtype lint.

Round 3 shipped four oracles whose final column was an un-cast integer
``SUM``: DuckDB returns HUGEINT (Arrow decimal128(38,0)) where Spark emits
BIGINT, and the driver's dtype-sensitive hasher failed them even though every
value matched.  This test runs every registered oracle on DuckDB alone (no
Spark session — fast) and fails if any output column carries the HUGEINT
signature, which Spark can never produce.
"""

from __future__ import annotations

import sys

import duckdb
import pyarrow as pa
import pytest

sys.path.insert(0, ".")

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")
SF_DIR = "/root/testdata/sf0.001"


def _oracles():
    import __spark_entry__ as entrymod
    return sorted(entrymod.oracle_sql().items())


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _hugeint_cols(schema: pa.Schema) -> list[str]:
    bad = []
    for f in schema:
        t = f.type
        if pa.types.is_decimal(t) and t.precision == 38 and t.scale == 0:
            bad.append(f.name)
    return bad


@pytest.mark.parametrize("name,sql", _oracles(),
                         ids=[n for n, _ in _oracles()])
def test_oracle_has_no_hugeint_output(con, name, sql):
    tbl = con.execute(sql).fetch_arrow_table()
    bad = _hugeint_cols(tbl.schema)
    assert not bad, (
        f"oracle {name!r} emits HUGEINT column(s) {bad}: wrap the integer "
        f"SUM in CAST(... AS BIGINT) so DuckDB matches Spark's int64")
