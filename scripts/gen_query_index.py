"""Regenerate QUERIES.md: one row per registered gate query — name, module,
first docstring line, and whether it carries a value-hash oracle.

Usage: python scripts/gen_query_index.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from osm_pg_etl_spark.plans.registry import all_oracles, all_queries  # noqa: E402


def first_line(fn) -> str:
    doc = (fn.__doc__ or "").strip()
    if not doc:
        return ""
    # collapse the first sentence-ish chunk to one line
    head = doc.split("\n\n")[0].replace("\n", " ")
    head = " ".join(head.split())
    return head if len(head) <= 160 else head[:157] + "..."


def main() -> None:
    qs, os_ = all_queries(), all_oracles()
    lines = [
        "# Query registry",
        "",
        f"{len(qs)} gate queries, {len(os_)} with value-hash DuckDB oracles "
        "(the rest are rows-only checks). Regenerate with "
        "`python scripts/gen_query_index.py`.",
        "",
        "| query | module | oracle | what it checks |",
        "|---|---|---|---|",
    ]
    for name in sorted(qs):
        fn = qs[name]
        mod = fn.__module__.rsplit(".", 1)[-1]
        lines.append(f"| `{name}` | {mod} | "
                     f"{'hash' if name in os_ else 'rows-only'} | "
                     f"{first_line(fn)} |")
    with open("QUERIES.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"QUERIES.md: {len(qs)} queries")


if __name__ == "__main__":
    main()
