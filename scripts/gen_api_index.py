"""Regenerate API.md: every public function/class in the package with its
signature and first docstring line — the parity-check map from reference
behavior to engine entry points.

Usage: python scripts/gen_api_index.py
"""

from __future__ import annotations

import importlib
import inspect
import re
import pkgutil
import sys

sys.path.insert(0, ".")

import osm_pg_etl_spark as pkg

SKIP_PREFIXES = ("_",)


def first_line(obj) -> str:
    doc = inspect.getdoc(obj) or ""
    line = doc.splitlines()[0].strip() if doc else ""
    return line


def main() -> None:
    rows: list[tuple[str, str, str, str]] = []
    for m in sorted(pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."),
                    key=lambda m: m.name):
        if m.name.endswith("__main__"):
            continue
        mod = importlib.import_module(m.name)
        short = m.name.removeprefix("osm_pg_etl_spark.")
        for name, obj in sorted(vars(mod).items()):
            if name.startswith(SKIP_PREFIXES):
                continue
            if not (inspect.isfunction(obj) or inspect.isclass(obj)):
                continue
            if getattr(obj, "__module__", None) != m.name:
                continue  # re-exports listed where they are defined
            try:
                sig = str(inspect.signature(obj))
            except (TypeError, ValueError):
                sig = "(...)"
            # function-object defaults repr with a process-specific
            # address — strip it so regeneration is deterministic
            sig = re.sub(r"<function ([\w.]+) at 0x[0-9a-f]+>",
                         r"<function \1>", sig)
            if len(sig) > 80:
                sig = sig[:77] + "..."
            kind = "class" if inspect.isclass(obj) else "def"
            rows.append((short, f"{kind} {name}{sig}", first_line(obj),
                         name))

    with open("API.md", "w") as f:
        f.write("# API index\n\n")
        f.write(f"{len(rows)} public entry points. Regenerate with "
                "`python scripts/gen_api_index.py`.\n\n")
        cur = None
        for short, sig, doc, _ in rows:
            if short != cur:
                f.write(f"\n## `{short}`\n\n")
                cur = short
            f.write(f"- `{sig}`")
            if doc:
                f.write(f" — {doc}")
            f.write("\n")
    print(f"API.md: {len(rows)} entries")


if __name__ == "__main__":
    main()
