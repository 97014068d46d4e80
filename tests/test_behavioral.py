"""Unit semantics for the behavioral analytics operators."""

from __future__ import annotations

import datetime as dt

from algoritmos_etl_spark.operators import behavioral


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, d, h), u, t, 1.0, p)
            for i, (u, d, h, t, p) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_funnel_requires_step_order(spark):
    rows = [
        # u1: view -> click -> purchase (reaches all 3)
        (1, 1, 1, "view", "{}"),
        (1, 1, 2, "click", "{}"),
        (1, 1, 3, "purchase", "{}"),
        # u2: purchase BEFORE view: first-touch order broken at step 2;
        # still counts for view and (view<=click) stages
        (2, 1, 1, "purchase", "{}"),
        (2, 1, 2, "view", "{}"),
        (2, 1, 3, "click", "{}"),
        # u3: click only — no view, reaches nothing
        (3, 1, 1, "click", "{}"),
        # u4: view only
        (4, 1, 5, "view", "{}"),
    ]
    out = {
        r["step"]: r["n_users"]
        for r in behavioral.funnel_counts(
            _ev(spark, rows), ["view", "click", "purchase"]
        ).collect()
    }
    assert out == {"view": 3, "click": 2, "purchase": 1}


def test_retention_offsets_are_week_grain(spark):
    rows = [
        # u1 first event Mon 2024-01-01 week; active again on
        # 2024-01-10 (week offset 1) and twice on one day (dedup)
        (1, 1, 9, "view", "{}"),
        (1, 10, 9, "view", "{}"),
        (1, 10, 12, "click", "{}"),
        # u2 first event 2024-01-10 (cohort week 2024-01-08)
        (2, 10, 9, "view", "{}"),
    ]
    out = behavioral.retention_cohorts(_ev(spark, rows)).collect()
    got = {(str(r["cohort_week"]), r["week_offset"]): r["n_active_users"] for r in out}
    assert got == {
        ("2024-01-01", 0): 1,  # u1 week 0
        ("2024-01-01", 1): 1,  # u1 active in its week 1
        ("2024-01-08", 0): 1,  # u2 week 0
    }


def test_props_stats_skips_missing_and_malformed(spark):
    rows = [
        (1, 1, 1, "view", '{"k": 10}'),
        (2, 1, 2, "view", '{"k": 30}'),
        (3, 1, 3, "view", '{"other": 5}'),  # missing field -> not counted
        (4, 1, 4, "click", "not json"),  # malformed -> not counted
    ]
    out = {r["event_type"]: r for r in behavioral.props_stats(_ev(spark, rows)).collect()}
    assert out["view"]["n_present"] == 2
    assert out["view"]["avg_v"] == 20.0
    assert out["view"]["min_v"] == 10 and out["view"]["max_v"] == 30
    assert out["click"]["n_present"] == 0
