import os
import sys, inspect
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as E

q = E.queries()
o = E.oracle_sql()
lines = [
    "# CATALOG — the registered query surface",
    "",
    "Auto-generated index (tools/gen_catalog.py) of every",
    "`__spark_entry__.queries()` entry: one-line summary from the query",
    "docstring, plus its correctness check.  \"oracle\" = hash-compared",
    "against DuckDB SQL at sf0.01 by the driver (and locally by",
    "`tests/oracle_mirror.py`); \"rows-only\" = row-count/schema check",
    f"only ({len(q)-len(o)} queries, each with a driver-checked oracle twin",
    "pinning its machinery).  The first 50 entries form the current driver",
    "verification window (see `queries()` docstring for the rotation).",
    "",
    "| # | query | check | summary |",
    "|---|---|---|---|",
]
for i, (name, fn) in enumerate(q.items(), 1):
    doc = inspect.getdoc(fn) or ""
    first = doc.split(".")[0].replace("\n", " ").strip()
    first = " ".join(first.split())
    if len(first) > 160:
        first = first[:157] + "..."
    check = "oracle" if name in o else "rows-only"
    lines.append(f"| {i} | `{name}` | {check} | {first} |")
open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "CATALOG.md"), "w").write("\n".join(lines) + "\n")
print("wrote", len(q), "entries")
