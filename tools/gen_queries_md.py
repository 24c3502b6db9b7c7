"""Regenerate QUERIES.md: the generated index of every registry entry
(driver-window position, oracle coverage, docstring lead).

Usage: python tools/gen_queries_md.py
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xorq_spark.queries import QUERIES, ORACLES
from xorq_spark.queries.suites_spec import SUITES

lines = [
    "# QUERIES — the %d-entry correctness catalog" % len(QUERIES),
    "",
    "Generated index (tools/gen_queries_md.py): every `queries()` entry,",
    "its driver-window position, oracle coverage, and purpose (docstring",
    "lead). Entries 1-50 are what the external driver hash-checks;",
    "`tools/check_oracle.py` checks all of them.",
    "",
    "| # | query | oracle | purpose |",
    "|---|---|---|---|",
]
for i, (name, fn) in enumerate(QUERIES.items(), 1):
    if name in SUITES:
        doc = "composite suite certifying: " + ", ".join(SUITES[name])
    else:
        doc = (fn.__doc__ or "").strip().split("\n")[0].strip()
    if len(doc) > 110:
        doc = doc[:107] + "..."
    doc = doc.replace("|", "\\|")
    oracle = "sql" if name in ORACLES else "rows-only"
    win = "**window**" if i <= 50 else ""
    lines.append(f"| {i} {win} | `{name}` | {oracle} | {doc} |")
open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md"), "w").write("\n".join(lines) + "\n")
print("wrote QUERIES.md:", len(QUERIES), "entries")
