"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet dir,
compare row count + column names + order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

sys.path.insert(0, ".")

import duckdb

from osm_pg_etl_spark.session import get_spark

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            v = 0.0
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return repr(float(v))
    except ImportError:
        pass
    return repr(v)


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def spark_dtype_canon(dt: str) -> str:
    """Spark simpleString dtype -> canonical comparable form."""
    dt = dt.strip().lower()
    simple = {"tinyint": "int8", "smallint": "int16", "int": "int32",
              "integer": "int32", "bigint": "int64", "long": "int64",
              "float": "float32", "double": "float64", "string": "string",
              "boolean": "bool", "date": "date", "binary": "binary"}
    if dt in simple:
        return simple[dt]
    if dt.startswith("timestamp"):
        return "timestamp"
    if dt.startswith("decimal"):
        return dt.replace(" ", "")
    if dt.startswith("array<"):
        return f"list<{spark_dtype_canon(dt[6:-1])}>"
    return dt


def arrow_type_canon(t) -> str:
    """pyarrow DataType -> the same canonical form as spark_dtype_canon.

    HUGEINT comes out of DuckDB's Arrow surface as decimal128(38,0), so an
    un-cast integer SUM shows up here as ``decimal(38,0)`` vs Spark's
    ``int64`` — exactly the driver-hash divergence that burned round 3."""
    import pyarrow as pa
    if pa.types.is_integer(t):
        return f"int{t.bit_width}"
    if pa.types.is_floating(t):
        return f"float{t.bit_width}"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{arrow_type_canon(t.value_type)}>"
    return str(t)


def dtype_problems(sdtypes, arrow_schema):
    """Compare Spark dtypes vs DuckDB's Arrow schema column-by-column."""
    smap = {c: spark_dtype_canon(d) for c, d in sdtypes}
    out = []
    for field in arrow_schema:
        if field.name not in smap:
            continue
        oc, sc = arrow_type_canon(field.type), smap[field.name]
        if oc != sc:
            out.append(f"{field.name}: spark={sc} oracle={oc}")
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    ok = fail = skipped = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            sdtypes = sdf.dtypes
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            skipped += 1
            continue
        try:
            res = con.execute(oracles[name])
            otbl = res.fetch_arrow_table()
            ocols = otbl.column_names
            orows = [tuple(d[c] for c in ocols) for d in otbl.to_pylist()]
        except Exception:
            print(f"FAIL {name}: duckdb error")
            traceback.print_exc()
            fail += 1
            continue

        problems = dtype_problems(sdtypes, otbl.schema)
        if problems:
            problems = ["dtype: " + ", ".join(problems)]
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema: spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount: spark={len(srows)} oracle={len(orows)}")
        if not problems:
            sm, om = rows_to_multiset(scols, srows), rows_to_multiset(ocols, orows)
            if sm != om:
                diff_s = [r for r in sm if r not in set(om)][:3]
                diff_o = [r for r in om if r not in set(sm)][:3]
                problems.append(f"values: spark-only={diff_s} oracle-only={diff_o}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            fail += 1
        else:
            print(f"OK   {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
            ok += 1

    print(f"\n{ok} ok, {fail} fail, {skipped} rows-only")
    spark.stop()
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())
