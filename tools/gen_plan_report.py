"""Generate PLANS.md — the physical-plan audit catalog: for every
registry query, the plan features that decide 100 TB fate (exchange
count, join strategies, codegen spans, Python boundaries, top-k
operator). Regenerate: python tools/gen_plan_report.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from algoritmos_etl_spark.driver_queries import REGISTRY, REGISTRY_ORDER
    from algoritmos_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-report", cpus=8)

    rows = []
    for name in REGISTRY_ORDER:
        try:
            df = REGISTRY[name].build(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # streaming-only builds etc.
            rows.append((name, f"(not plannable statically: {type(exc).__name__})"))
            continue
        lines = plan.splitlines()
        n_exch = len(
            [l for l in lines if re.search(r"\bExchange\b", l) and "Broadcast" not in l]
        )
        feats = {
            "shuffles": n_exch,
            "BHJ": plan.count("BroadcastHashJoin"),
            "SMJ": plan.count("SortMergeJoin"),
        }
        extras = []
        if "TakeOrderedAndProject" in plan:
            extras.append("TopK")
        if "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan:
            extras.append("bounded-cross")
        for py in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
            if py in plan:
                extras.append("Arrow-Python")
                break
        if "BatchEvalPython" in plan:
            extras.append("!ROW-PYTHON!")  # must never appear (gated)
        desc = (
            f"shuffles={feats['shuffles']} bhj={feats['BHJ']} "
            f"smj={feats['SMJ']}"
        )
        if extras:
            desc += " " + ",".join(extras)
        rows.append((name, desc))
    spark.stop()

    out = [
        "# Plan audit catalog (auto-generated — tools/gen_plan_report.py)",
        "",
        "Physical-plan features per registry query at sf0.001 (plan SHAPE "
        "is scale-invariant under AQE; absolute partition counts are not "
        "shown; codegen spans only materialize post-execution under AQE — "
        "the whole-stage-codegen discipline is gated by "
        "tests/test_plans.py::test_hot_path_stays_in_codegen). "
        "`shuffles` counts non-broadcast Exchanges; `bhj`/`smj` "
        "broadcast-hash vs sort-merge joins; `TopK` = TakeOrderedAndProject; "
        "`bounded-cross` = a declared bounded cartesian (see "
        "tests/test_plan_hygiene.py CROSS_OK); `Arrow-Python` = an "
        "Arrow-batched Python boundary. Row-at-a-time Python "
        "(`BatchEvalPython`) is gated to never appear.",
        "",
        "| query | plan features |",
        "|---|---|",
    ]
    for name, desc in rows:
        out.append(f"| `{name}` | {desc} |")
    path = os.path.join(REPO, "PLANS.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out) + "\n")
    print(f"wrote {path}: {len(rows)} queries")


if __name__ == "__main__":
    main()
