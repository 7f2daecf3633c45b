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


# --- high-scale decimal-cast lint (round 4) ---------------------------------
#
# DuckDB's double->decimal cast multiplies by 10^scale IN DOUBLE before
# rounding, while Spark converts via exact BigDecimal; once |value|*10^scale
# approaches 2^53 the engines round differently and value hashes diverge
# (burned by group_regression's first draft at DECIMAL(38,12) over
# hours-since-epoch ~4.7e5). Keep oracle decimal casts at the dsum
# convention (scale <= 6) unless the cast input is exactly representable.
_HIGH_SCALE_ALLOW = {
    # float32-derived embedding components (24-bit mantissa, |x| <= ~1) and
    # every consumer rounds before comparison — cast flips cannot surface
    "similarity_ivf_topk",
    # nests the similarity_ivf_topk oracle verbatim as a CTE (the recall
    # measurement replays it) — same exception, same reasoning
    "ann_recall",
    # nests the same IVF Lloyd CTE chain (_sql_ivf_cell_ctes) — the
    # DECIMAL(38,18) sums are over float32-derived components, exactly
    # the similarity_ivf_topk case
    "semantic_dedup",
}


@pytest.mark.parametrize("name,sql", _oracles(),
                         ids=[n for n, _ in _oracles()])
def test_oracle_decimal_casts_are_portable_scale(name, sql):
    import re
    if name in _HIGH_SCALE_ALLOW:
        pytest.skip("documented exception (see _HIGH_SCALE_ALLOW)")
    high = sorted({f"DECIMAL({p},{s})"
                   for p, s in re.findall(r"DECIMAL\((\d+),\s*(\d+)\)",
                                          sql, re.IGNORECASE)
                   if int(s) >= 10})
    assert not high, (
        f"oracle {name!r} casts at non-portable decimal scale {high}: "
        f"DuckDB's double->decimal goes through a 10^scale double multiply "
        f"— rebase/shrink the value and cast at scale <= 6 (dsum "
        f"convention), or add a documented exception")
