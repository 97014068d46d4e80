"""Profiling tests: exact tier vs hand counts, sketch tier error bounds."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from algoritmos_etl_spark.operators import profiling
from algoritmos_etl_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_exact_profile(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")], "x int, s string"
    )
    prof = {r.column: r for r in profiling.profile_table(df).collect()}
    assert prof["x"].n_rows == 4
    assert prof["x"].n_nulls == 1 and prof["x"].n_distinct == 2
    assert prof["x"].min_value == "1" and prof["x"].max_value == "2"
    assert prof["s"].n_nulls == 1 and prof["s"].n_distinct == 2


def test_approx_profile_error_bound(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    cols = ["l_orderkey", "l_quantity", "l_shipdate"]
    exact = {r.column: r for r in profiling.profile_table(li, cols).collect()}
    approx = {r.column: r for r in profiling.approx_profile(li, cols).collect()}
    for c in cols:
        rel_err = abs(approx[c].approx_distinct - exact[c].n_distinct) / max(
            exact[c].n_distinct, 1
        )
        assert rel_err < 0.1, f"{c}: HLL error {rel_err}"
    # quantiles present only for numerics, ordered
    q = approx["l_quantity"].quantiles
    assert q is not None and q == sorted(q)
    assert approx["l_shipdate"].quantiles is None
