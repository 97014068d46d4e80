"""Compaction maintenance pass: layout, parallelism, and fidelity."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from algoritmos_etl_spark.sources.compact import compact_table
from algoritmos_etl_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_compact_rewrites_single_row_group_table(spark, tmp_path):
    dest = str(tmp_path / "lineitem_compact")
    report = compact_table(
        spark,
        f"{SF_DIR}/lineitem.parquet",
        dest,
        target_files=8,
        sort_within_partitions_by=["l_shipdate"],
    )
    src = load_table(spark, SF_DIR, "lineitem")
    assert report["rows"] == src.count()
    assert report["files_after"] >= 8  # scan now has >= 8 splits

    files = glob.glob(f"{dest}/*.parquet")
    assert len(files) == 8
    # content identical (order-insensitive)
    back = spark.read.parquet(dest)
    assert (
        sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
    )
    # within-file l_shipdate runs are sorted -> min/max pruning works
    f = pq.ParquetFile(files[0])
    tbl = f.read(columns=["l_shipdate"])
    vals = tbl.column(0).to_pylist()
    assert vals == sorted(vals)


def test_compact_bounds_records_per_file(spark, tmp_path):
    dest = str(tmp_path / "orders_compact")
    compact_table(
        spark,
        f"{SF_DIR}/orders.parquet",
        dest,
        target_files=2,
        max_records_per_file=300,
    )
    for fp in glob.glob(f"{dest}/*.parquet"):
        assert pq.ParquetFile(fp).metadata.num_rows <= 300
