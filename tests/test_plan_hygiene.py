"""Plan-hygiene gate over EVERY registry query.

Automates the anti-pattern scan a reviewer would run by hand: no
registered query may plan a row-at-a-time Python UDF (BatchEvalPython —
all Python boundaries must be Arrow-batched), and cartesian/nested-loop
joins may appear only where they are provably bounded (declared below
with the reason). New queries inherit the gate automatically.
"""

from __future__ import annotations

import pytest

from algoritmos_etl_spark.driver_queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"

# queries whose plans legitimately contain a cartesian/nested-loop join,
# with the boundedness argument
CROSS_OK = {
    "bm25_topk": "postings × 1-row corpus stats (N, avgdl) broadcast",
    "table_profile": "1-row plain-stats agg × 1-row distinct-counts agg",
    "pair_metrics": "1-row similarity × 1-row regression bundles",
    "risk_classification": "per-symbol rows × 1-row percentile thresholds",
    "risk_summary": "per-symbol rows × 1-row percentile thresholds",
    "dtw_report": "array-packed series rows capped at 100 symbols (distance "
    "arm) + two single-series rows for one pair (path arm)",
    "correlation_heatmap": "B(B+1)/2 block-pair rows, B bounded by symbol target",
    "align_to_calendar": "calendar × symbol dimension grid (both bounded dims)",
    "ann_cosine_topk": "corpus streamed once against a BROADCAST handful of "
    "query vectors (n×q with tiny q) — the brute-force baseline by design",
    "quality_expectations": "1-row n_checked agg × 1-row anti-join count per "
    "foreign_key rule",
}


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_antipattern_in_plan(spark, name):
    df = REGISTRY[name].build(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in plan — use an Arrow-batched "
        f"mapInPandas/applyInPandas boundary instead"
    )
    has_cross = (
        "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan
    )
    if has_cross:
        assert name in CROSS_OK, (
            f"{name}: unexpected cartesian/nested-loop join — either fix the "
            f"plan or declare it in CROSS_OK with a boundedness argument"
        )
