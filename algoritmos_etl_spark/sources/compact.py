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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def compact_table(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    target_files: int = 32,
    max_records_per_file: int | None = None,
    sort_within_partitions_by: list[str] | None = None,
    row_group_bytes: int | None = None,
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
    if row_group_bytes:
        writer = writer.option("parquet.block.size", row_group_bytes)
    writer.parquet(dest_path)
    back = spark.read.parquet(dest_path)
    return {
        "rows": back.count(),
        "files_before": files_before,
        "files_after": len(back.inputFiles()),
    }


def bucketize_table(
    spark: SparkSession,
    src_path: str,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    path: str | None = None,
) -> dict:
    """Rewrite a parquet table BUCKETED (hash-partitioned into files)
    by the join key — the ingest-time layout that deletes the shuffle
    from every later join/aggregation on that key.

    Two tables bucketed by the same key into the same bucket count
    sort-merge join with ZERO Exchange on either side (pinned by
    test_compact): at 100 TB that is the difference between re-shuffling
    the fact table per query and never shuffling it again. Bucket
    files also sort by the key (`sortBy`), so the join's per-bucket
    sort is a cheap merge of pre-sorted runs.

    Bucketing rides the session catalog (`saveAsTable` — bucket
    metadata lives in the table definition, which is what the reader
    consults to elide the Exchange); `path` makes it an external table
    at an explicit location.
    """
    df = spark.read.parquet(src_path)
    writer = (
        df.repartition(n_buckets, *bucket_cols)
        .write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)
    back = spark.table(table_name)
    return {"rows": back.count(), "table": table_name, "n_buckets": n_buckets}


def zorder_value(cols: list[Column], bits: int = 16) -> Column:
    """Z-order (Morton) key: interleave the low `bits` bits of each
    column — round-robin, column 0 owning the least-significant lane.

    Pure JVM bit arithmetic (shiftleft/bitwise OR fold, codegen
    inlines it); callers must pass non-negative integral columns
    (clamp/offset upstream). len(cols)·bits must fit a long (≤ 63).
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols × {bits} bits exceeds a long")
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def zorder_table(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    cols: list[str],
    bits: int = 16,
    target_files: int = 32,
    row_group_bytes: int | None = None,
) -> dict:
    """Rewrite a parquet table clustered by Z-order over `cols`, so
    range/point predicates on ANY of the interleaved dimensions get
    row-group min/max pruning — the multi-column generalization of
    `sort_within_partitions_by` (which only serves its leading column).

    `repartitionByRange` on the z-value makes files own disjoint
    z-ranges (a shuffle, same as compaction); `sortWithinPartitions`
    orders rows inside each file so row-group stats are tight on every
    interleaved column. The z-column itself is dropped from the
    output — it's a layout key, not data. Pruning effectiveness is
    pinned quantitatively in test_compact against the same rewrite
    without z-ordering.
    """
    df = spark.read.parquet(src_path)
    z = zorder_value([F.col(c) for c in cols], bits=bits).alias("_z")
    writer = (
        df.withColumn("_z", z)
        .repartitionByRange(target_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
    )
    if row_group_bytes:
        # row groups are the stats-pruning granule; tiny corpora need
        # sub-default groups for the layout to have any resolution
        writer = writer.option("parquet.block.size", row_group_bytes)
    writer.parquet(dest_path)
    back = spark.read.parquet(dest_path)
    return {
        "rows": back.count(),
        "files_after": len(back.inputFiles()),
        "cols": list(cols),
    }


def partition_upsert(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    partition_col: str,
    key_cols: list[str],
) -> dict:
    """MERGE an update batch into a partitioned parquet table by
    rewriting ONLY the touched partitions (dynamic partition
    overwrite) — the partition-level upsert every non-transactional
    lake runs nightly. Update rows replace current rows with the same
    key; untouched partitions' files are never read or written, which
    is the property that makes a 10-partition fix to a 10,000-partition
    table cost 10 partitions, not a table rewrite.

    The touched-partition list is collected (bounded by the update
    batch's own partition spread) and pushed as an `isin` filter so
    the read STATICALLY prunes to touched directories. The merged
    result is EAGERLY materialized before the write — overwriting a
    directory lazily read in the same plan is the classic
    read-under-write corruption; the checkpoint breaks the dependency.
    Returns {"partitions": n, "rows": m} for scheduler logging.

    `updates` must be keyed (unique on `key_cols`) — with duplicate
    update keys the replace is ill-defined; collapse first
    (`cleaning.keep_latest`), same contract as `reconcile.table_diff`.

    CONTRACT: `partition_col` must be STABLE per key — effectively
    part of the key (the tests use it so). An update row whose key
    already exists in a partition NOT present in the update batch
    would leave the stale row in the old partition (only touched
    partitions are read and rewritten), yielding the same key in two
    partitions. Keys that genuinely move partitions need a
    delete+insert through the CDC path (`reconcile.cdc_merge`) or a
    full-table `snapshots` rewrite, not a partition-local upsert.
    """
    touched = [
        r[0]
        for r in updates.select(partition_col).distinct().collect()
    ]
    current = spark.read.option("basePath", table_dir).parquet(
        table_dir
    ).filter(F.col(partition_col).isin(touched))
    cols = current.columns
    tagged = current.select(*cols).withColumn(
        "_src", F.lit(0)
    ).unionByName(updates.select(*cols).withColumn("_src", F.lit(1)))
    merged = (
        tagged.groupBy(*key_cols)
        .agg(
            F.max_by(
                F.struct(*[c for c in cols if c not in key_cols]),
                F.col("_src"),
            ).alias("_w")
        )
        .select(
            *key_cols,
            *[
                F.col(f"_w.{c}").alias(c)
                for c in cols
                if c not in key_cols
            ],
        )
        .localCheckpoint()  # EAGER: sever the read before overwriting it
    )
    n_rows = merged.count()
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(table_dir)
    )
    return {"partitions": len(touched), "rows": int(n_rows)}


def write_audit_publish(
    df: DataFrame,
    table_dir: str,
    rules: list,
    keep_failed_stage: bool = True,
) -> dict:
    """Write-Audit-Publish: stage the dataset beside the table, run the
    declarative expectation gate (`operators/expectations.check`) ON
    THE STAGED FILES, and only then publish with an atomic directory
    swap — readers see the old table or the new one, never a partial
    or unaudited write. The pattern every production lake uses to keep
    bad batches out of serving tables, composed from the engine's own
    pieces.

    Audit reads the staged parquet back (not the input DataFrame):
    the gate certifies WHAT WAS WRITTEN — encoding and all — not the
    plan that was supposed to write it. On failure the stage is kept
    by default for debugging (`<table>._staged`) and the serving table
    is untouched. Returns {"published": bool, "rows": n,
    "violations": [(rule, n) ...]}.

    Publish-atomicity scope (documented, not hidden): the swap is TWO
    sequential os.renames on a LOCAL POSIX filesystem — a reader
    resolving `table_dir` in the instant between them gets ENOENT and
    must retry, and a crash between them leaves the serving table
    stranded at `<table>._retired`. Both windows are recovered: this
    function (and any later publish) first restores a stranded
    `._retired` dir when `table_dir` is missing, so the table is never
    permanently dark. os.rename atomicity does NOT hold on object
    stores — for true single-pointer atomicity plus time travel use
    `sources.snapshots` (manifest swap is ONE rename of a file).
    """
    import os
    import shutil

    from ..operators import expectations

    spark = df.sparkSession
    stage = f"{table_dir}._staged"
    retire = f"{table_dir}._retired"
    # crash recovery: a previous publish that died between its two
    # renames left the serving data at ._retired and no table_dir —
    # promote it back before doing anything else.
    if not os.path.exists(table_dir) and os.path.exists(retire):
        os.rename(retire, table_dir)
    shutil.rmtree(stage, ignore_errors=True)
    df.write.mode("overwrite").parquet(stage)

    staged = spark.read.parquet(stage)
    report = expectations.check(staged, rules).collect()
    violations = [
        (r.rule, int(r.n_violations)) for r in report if not r.passed
    ]
    if violations:
        if not keep_failed_stage:
            shutil.rmtree(stage, ignore_errors=True)
        return {
            "published": False,
            "rows": int(staged.count()),
            "violations": violations,
        }
    n = int(staged.count())
    # atomic publish: two renames — retire the old dir, promote the
    # stage. Readers holding the old path keep their already-opened
    # files (POSIX), new readers resolve the promoted directory.
    shutil.rmtree(retire, ignore_errors=True)
    if os.path.exists(table_dir):
        os.rename(table_dir, retire)
    os.rename(stage, table_dir)
    shutil.rmtree(retire, ignore_errors=True)
    return {"published": True, "rows": n, "violations": []}
