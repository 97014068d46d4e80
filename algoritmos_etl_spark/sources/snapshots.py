"""Manifest-based snapshot tables: atomic commits + time travel.

The versioned-read pattern of `streaming.mv.read_cdc_state`
generalized to the WHOLE table-maintenance family (the mini-Iceberg
the reference's flat CSV master lacks, and the layer the
compaction/upsert/WAP ops in `sources.compact` need for true reader
isolation):

  <table>/data/c<version>-<nonce>/part-*.parquet   immutable data files
  <table>/_manifests/v=<version>.json              the commit pointer

A commit writes NEW immutable data files first, then publishes ONE
manifest file via a tmp-write + os.link (exclusive create) — the
single-pointer atomic publish that `compact.write_audit_publish`'s
two-rename dance cannot give. Readers resolve a manifest (newest, or
any retained historical version) and read EXACTLY its file list, so:

- a reader is ATOMIC against concurrent compaction/publish: the files
  a manifest names are never mutated, only superseded and eventually
  vacuumed;
- time travel is `read_as_of(version)`; lineage is `table_history`;
- a crash between data-write and manifest-link leaves orphan data
  files that no reader can see — `vacuum` retires them.

Concurrency contract: os.link fails (EEXIST) when the target version
was taken, so racing committers never silently overwrite each other —
the loser retries against the next version number. Local-POSIX scope,
same as the rest of the layout family (object stores want a
conditional-PUT here).

Reference anchor: the reference re-reads its whole CSV master per
request (`app.py:109`, `main.py:118`) — no versioning, last-writer
wins; this module is the scale-safe replacement surface.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


def _manifest_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_manifests")


def _versions(table_dir: str) -> list[int]:
    mdir = _manifest_dir(table_dir)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        if name.startswith("v=") and name.endswith(".json"):
            out.append(int(name[2:-5]))
    return sorted(out)


def _read_manifest(table_dir: str, version: int) -> dict:
    with open(os.path.join(_manifest_dir(table_dir), f"v={version}.json")) as f:
        return json.load(f)


def _publish_manifest(table_dir: str, manifest: dict) -> int:
    """Atomically publish `manifest` at the next free version number.

    tmp-write + os.link: link is atomic AND fails with EEXIST if a
    racing committer took the version — content is fully durable
    before the pointer appears, and no commit ever overwrites another.
    """
    mdir = _manifest_dir(table_dir)
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex}.json")
    version = (_versions(table_dir) or [0])[-1] + 1
    try:
        while True:
            manifest["version"] = version
            with open(tmp, "w") as f:
                json.dump(manifest, f)
                f.flush()
                os.fsync(f.fileno())
            try:
                os.link(tmp, os.path.join(mdir, f"v={version}.json"))
                return version
            except FileExistsError:
                version += 1  # lost the race; retry at the next slot
    finally:
        os.unlink(tmp)


def _write_data(df: DataFrame, table_dir: str, version_hint: int) -> list[str]:
    """Write df as immutable files under a fresh commit subdir; returns
    table-relative file paths."""
    sub = f"data/c{version_hint}-{uuid.uuid4().hex[:8]}"
    out = os.path.join(table_dir, sub)
    df.write.mode("error").parquet(out)
    return sorted(
        f"{sub}/{name}"
        for name in os.listdir(out)
        if name.endswith(".parquet")
    )


def _count_rows(table_dir: str, files: list[str]) -> int:
    """Exact row count from parquet footers — local metadata reads,
    no Spark job."""
    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(os.path.join(table_dir, f)).metadata.num_rows
        for f in files
    )


def snapshot_commit(
    df: DataFrame,
    table_dir: str,
    mode: str = "append",
    op: str | None = None,
) -> int:
    """Commit `df` as a new table version. mode='append' adds its
    files to the current snapshot; 'overwrite' replaces the file list.
    Returns the committed version number."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"snapshot_commit: unknown mode {mode!r}")
    versions = _versions(table_dir)
    hint = (versions[-1] if versions else 0) + 1
    new_files = _write_data(df, table_dir, hint)
    prior: list[str] = []
    if mode == "append" and versions:
        prior = _read_manifest(table_dir, versions[-1])["files"]
    files = prior + new_files
    return _publish_manifest(
        table_dir,
        {
            "op": op or mode,
            "files": files,
            "n_rows": _count_rows(table_dir, files),
        },
    )


def read_as_of(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """The table exactly as manifest `version` (default: newest)
    recorded it. The returned DataFrame stays valid across ANY later
    commit/compaction (files are immutable until vacuum drops the
    version)."""
    versions = _versions(table_dir)
    if not versions:
        raise ValueError(f"no snapshots under {table_dir}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(
            f"version {v} not retained (have {versions}) — vacuumed or "
            "never committed"
        )
    m = _read_manifest(table_dir, v)
    if not m["files"]:
        raise ValueError(f"version {v} of {table_dir} is empty")
    return spark.read.parquet(
        *[os.path.join(table_dir, f) for f in m["files"]]
    )


def table_history(spark: SparkSession, table_dir: str) -> DataFrame:
    """(version, op, n_files, n_rows) per retained manifest — the
    audit/lineage view."""
    rows = [
        (
            v,
            m["op"],
            len(m["files"]),
            m["n_rows"],
        )
        for v in _versions(table_dir)
        for m in [_read_manifest(table_dir, v)]
    ]
    return spark.createDataFrame(
        rows, "version long, op string, n_files long, n_rows long"
    )


def snapshot_compact(
    spark: SparkSession, table_dir: str, target_files: int = 1
) -> int:
    """Rewrite the current snapshot into `target_files` files and
    commit the result as a new version. Readers pinned at older
    versions keep their (still-present) files — snapshot isolation,
    where `compact.compact_table`'s in-place overwrite would race
    them."""
    cur = read_as_of(spark, table_dir)
    versions = _versions(table_dir)
    files = _write_data(
        cur.coalesce(target_files), table_dir, versions[-1] + 1
    )
    return _publish_manifest(
        table_dir,
        {
            "op": "compact",
            "files": files,
            "n_rows": _count_rows(table_dir, files),
        },
    )


def snapshot_upsert(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    key_cols: list[str],
) -> int:
    """Keyed MERGE committed as a new version: update rows replace
    current rows with the same key (updates must be unique on
    key_cols, the `compact.partition_upsert` contract). Unlike
    partition_upsert this is key-safe under partition moves — the
    whole current snapshot participates."""
    from pyspark.sql import functions as F

    cur = read_as_of(spark, table_dir)
    cols = cur.columns
    tagged = (
        cur.select(*cols)
        .withColumn("_src", F.lit(0))
        .unionByName(updates.select(*cols).withColumn("_src", F.lit(1)))
    )
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
            *[F.col(f"_w.{c}").alias(c) for c in cols if c not in key_cols],
        )
    )
    versions = _versions(table_dir)
    files = _write_data(merged, table_dir, versions[-1] + 1)
    return _publish_manifest(
        table_dir,
        {
            "op": "upsert",
            "files": files,
            "n_rows": _count_rows(table_dir, files),
        },
    )


def snapshot_publish(
    df: DataFrame, table_dir: str, rules: list
) -> dict:
    """Write-Audit-Publish on the snapshot layer: stage data files,
    audit WHAT WAS WRITTEN, and publish with the ONE-rename manifest
    commit — closing `compact.write_audit_publish`'s documented
    two-rename window (readers here always resolve a complete
    manifest; a failed audit publishes nothing and leaves no stage
    dir to recover)."""
    from ..operators import expectations

    spark = df.sparkSession
    versions = _versions(table_dir)
    hint = (versions[-1] if versions else 0) + 1
    files = _write_data(df, table_dir, hint)
    staged = spark.read.parquet(
        *[os.path.join(table_dir, f) for f in files]
    )
    report = expectations.check(staged, rules).collect()
    violations = [
        (r.rule, int(r.n_violations)) for r in report if not r.passed
    ]
    if violations:
        # unpublished files are invisible to every reader; vacuum
        # retires them like any other orphan
        return {"published": False, "version": None, "violations": violations}
    v = _publish_manifest(
        table_dir,
        {
            "op": "publish",
            "files": files,
            "n_rows": _count_rows(table_dir, files),
        },
    )
    return {"published": True, "version": v, "violations": []}


def snapshot_changes(
    spark: SparkSession,
    table_dir: str,
    from_version: int,
    to_version: int | None = None,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Incremental read between two RETAINED versions — time travel
    composed with the keyed diff: (key…, diff_type ∈ {added, removed,
    changed}, changed_cols) for everything that changed between
    `from_version` and `to_version` (default: newest). This is the
    Iceberg/Delta "read the changes since snapshot N" surface: a
    downstream consumer syncs from v_N to head by ONE diff instead of
    reprocessing the table; `reconcile.diff_as_changes` over the same
    two reads ships it as a mergeable CDC changeset.

    Cost is |v_from| + |v_to| through one full-outer key join — both
    snapshots are plain file lists, so at 100 TB this is the same
    plan as any two-table diff (bucketed layouts make it
    exchange-free). `key_cols` must key both versions (the table_diff
    contract).
    """
    from ..operators.reconcile import table_diff

    if key_cols is None:
        raise ValueError("snapshot_changes: key_cols is required")
    left = read_as_of(spark, table_dir, from_version)
    right = read_as_of(spark, table_dir, to_version)
    return table_diff(left, right, key_cols)


def snapshot_vacuum(table_dir: str, keep: int = 2) -> dict:
    """Retire manifests beyond the `keep` newest (>= 1 — the current
    version always survives) plus every data file no retained manifest
    references (including orphans from crashed commits). Readers of
    retained versions are untouched: their files are all referenced."""
    import shutil

    keep = max(1, int(keep))
    versions = _versions(table_dir)
    doomed = versions[:-keep] if len(versions) > keep else []
    kept = [v for v in versions if v not in doomed]
    for v in doomed:
        os.unlink(os.path.join(_manifest_dir(table_dir), f"v={v}.json"))
    live: set[str] = set()
    for v in kept:
        live.update(_read_manifest(table_dir, v)["files"])
    data_dir = os.path.join(table_dir, "data")
    removed = 0
    if os.path.isdir(data_dir):
        for sub in os.listdir(data_dir):
            subdir = os.path.join(data_dir, sub)
            rel = f"data/{sub}"
            if not any(f.startswith(rel + "/") for f in live):
                shutil.rmtree(subdir, ignore_errors=True)
                removed += 1
    return {"manifests_removed": len(doomed), "commit_dirs_removed": removed}
