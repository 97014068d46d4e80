"""End-to-end ETL lifecycle + DTW path tests."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from algoritmos_etl_spark.operators import similarity
from algoritmos_etl_spark.plans import run_etl
from algoritmos_etl_spark.sources.readers import daily_bars, load_table

SF_DIR = "/root/testdata/sf0.001"


def test_run_etl_end_to_end(spark, tmp_path):
    out = str(tmp_path / "etl_out")
    report = run_etl(spark, SF_DIR, out, max_wide_symbols=5)
    assert report["n_symbols"] > 0
    assert report["rows_long"] == report["n_symbols"] * report["n_dates"]

    master = spark.read.parquet(f"{out}/master_long.parquet")
    assert master.count() == report["rows_long"]
    # forward-fill + drop-invalid ran BEFORE alignment: any null close in
    # the master is an alignment gap (symbol didn't trade that day)
    assert set(master.columns) >= {"symbol", "date", "close", "volume"}

    wide = spark.read.option("header", True).csv(f"{out}/master_wide_csv")
    assert wide.count() == report["n_dates"]
    assert len(wide.columns) == 1 + 5 * 5  # date + 5 fields x 5 symbols

    # year-partitioned layout: a year filter must prune at planning time
    some_year = master.select(F.min("year")).first()[0]
    pruned = master.filter(F.col("year") == some_year)
    fmt = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters: [isnotnull(year" in fmt, fmt


def test_dtw_path_consistency(spark):
    bars = daily_bars(load_table(spark, SF_DIR, "events")).cache()
    # downsampling off: this test pins the raw DP/backtrack invariants
    path_df = similarity.dtw_path(
        bars, 0, 1, target_points=None, path_points=None
    ).cache()
    rows = path_df.orderBy("step").collect()
    assert rows, "path must be non-empty"
    # path endpoints: (0,0) .. (n-1, m-1), monotone non-decreasing steps
    assert (rows[0].i, rows[0].j) == (0, 0)
    for prev, cur in zip(rows, rows[1:]):
        di, dj = cur.i - prev.i, cur.j - prev.j
        assert di in (0, 1) and dj in (0, 1) and di + dj >= 1
    # full-matrix path distance equals dtw_pairs with window=0
    dist = similarity.dtw_pairs(bars, pairs=[(0, 1)], window=0).first().dtw
    assert rows[0].dtw == pytest.approx(dist)
