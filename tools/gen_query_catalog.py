"""Generate QUERIES.md — the registry catalog: every driver query with
its correctness mode, window position, and one-line description.
Regenerate after registry changes: python tools/gen_query_catalog.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from algoritmos_etl_spark.driver_queries import (
        CORRECTNESS_WINDOW,
        REGISTRY,
        REGISTRY_ORDER,
    )

    lines = [
        "# Query catalog (auto-generated — tools/gen_query_catalog.py)",
        "",
        f"{len(REGISTRY_ORDER)} registered queries. Positions 1–"
        f"{CORRECTNESS_WINDOW} are the driver's correctness window "
        "(hash-checked against DuckDB oracles every round); the tail is "
        "transitively pinned (see REGISTRY_ORDER comments). "
        "`oracle`: full = value-hash checked; rows-only = BY-DESIGN "
        "engine-specific output, pinned by pytest against an exact "
        "reference.",
        "",
        "| # | query | oracle | description |",
        "|---|---|---|---|",
    ]
    for i, name in enumerate(REGISTRY_ORDER, 1):
        spec = REGISTRY[name]
        mode = "full" if spec.oracle else "rows-only"
        window = "window" if i <= CORRECTNESS_WINDOW else "tail"
        doc = " ".join(spec.doc.split())
        if len(doc) > 220:
            doc = doc[:217] + "..."
        doc = doc.replace("|", "\\|")
        lines.append(f"| {i} ({window}) | `{name}` | {mode} | {doc} |")
    out = os.path.join(REPO, "QUERIES.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(REGISTRY_ORDER)} queries")


if __name__ == "__main__":
    main()
