"""Incremental materialized-view maintenance over a keyed aggregate.

The lifecycle a 100 TB warehouse runs for its hot aggregates,
expressed with Structured Streaming + parquet deltas:

- `streaming_agg_mv` consumes a stream and writes ONE per-key partial
  aggregate per micro-batch under `path/delta/batch_id=N` — never
  touching previous state (no read-modify-write of a 100 TB base per
  batch; per-batch cost is the batch's own partial agg, map-side
  combined). The per-batch overwrite of its own directory makes
  replays idempotent, same contract as the streaming near-dup index.
- `read_agg_mv` is the VIEW: base (if compacted) + deltas, re-reduced
  by key. Sums are carried as decimal(30,10) through every merge —
  including compaction folds — and become double only at the view
  edge, so the view equals the batch GROUP BY bit-for-bit no matter
  how many deltas/compactions the total passed through
  (oracle-checked): Structured Streaming's incremental-view-
  maintenance guarantee made inspectable on disk.
- `compact_agg_mv` is the maintenance pass: folds all deltas (and the
  previous base) into `base/upto=N`. The read rule — base at max
  `upto`, plus deltas with `batch_id > upto` — stays correct while a
  compaction lands; re-running a crashed compaction rewrites the same
  fold, double-counting nothing. Merged deltas are retired lazily
  (they're ignored by the read rule the moment the base lands).

Partial-aggregability is the only requirement on the measure —
sum/count here; min/max/HLL merge the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

_SUM_T = "decimal(30,10)"
_PART_COLS = ("sum_part", "n_part")


def _partial(df: DataFrame, key_cols: list[str], value_col: str) -> DataFrame:
    return df.groupBy(*key_cols).agg(
        F.sum(F.col(value_col).cast(_SUM_T)).alias("sum_part"),
        F.count(F.lit(1)).alias("n_part"),
    )


def streaming_agg_mv(
    stream: DataFrame,
    path: str,
    key_cols: list[str],
    value_col: str,
    checkpoint: str,
    timeout_sec: int = 120,
):
    """Maintain the (key → sum, count) view incrementally; see module
    docstring for the delta layout and idempotency contract."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        (
            _partial(batch_df, key_cols, value_col)
            .write.mode("overwrite")
            .parquet(f"{path}/delta/batch_id={batch_id}")
        )

    query = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    # awaitTermination(timeout) returns False on timeout with the
    # writer still in flight; returning normally then would hand the
    # caller a silently partial view (and racing cleanup code a live
    # writer). Stop the query and fail loudly instead.
    if not query.awaitTermination(timeout_sec):
        query.stop()
        raise TimeoutError(
            f"streaming_agg_mv: availableNow run exceeded {timeout_sec}s; "
            f"view at {path} is incomplete"
        )
    return query


def _read_or_none(spark: SparkSession, pattern: str, base: str):
    try:
        return spark.read.option("basePath", base).parquet(pattern)
    except AnalysisException:
        return None  # no such layer yet


def _fold_partials(spark: SparkSession, path: str) -> DataFrame:
    """base-at-max-upto + applicable deltas, re-reduced by key; sums
    stay decimal-exact (the only double cast is at the view edge)."""
    deltas = _read_or_none(spark, f"{path}/delta", f"{path}/delta")
    base = _read_or_none(spark, f"{path}/base", f"{path}/base")
    upto = -1
    if base is not None:
        row = base.agg(F.max("upto")).first()
        upto = row[0] if row[0] is not None else -1
        base = base.filter(F.col("upto") == upto).drop("upto")
    parts = []
    if base is not None:
        parts.append(base)
    if deltas is not None:
        parts.append(deltas.filter(F.col("batch_id") > upto).drop("batch_id"))
    if not parts:
        raise ValueError(f"no MV state under {path}")
    all_parts = parts[0]
    for p in parts[1:]:
        all_parts = all_parts.unionByName(p)
    key_cols = [c for c in all_parts.columns if c not in _PART_COLS]
    return all_parts.groupBy(*key_cols).agg(
        F.sum("sum_part").cast(_SUM_T).alias("sum_part"),
        F.sum("n_part").alias("n_part"),
    )


def read_agg_mv(spark: SparkSession, path: str) -> DataFrame:
    """The view: one row per key, (key…, total_value double, n_rows)."""
    folded = _fold_partials(spark, path)
    key_cols = [c for c in folded.columns if c not in _PART_COLS]
    return folded.select(
        *key_cols,
        F.col("sum_part").cast("double").alias("total_value"),
        F.col("n_part").alias("n_rows"),
    )


def compact_agg_mv(spark: SparkSession, path: str) -> dict:
    """Fold every applicable delta (plus the previous base) into a new
    base layer; returns {"upto": N, "keys": k} for scheduler logging."""
    deltas = _read_or_none(spark, f"{path}/delta", f"{path}/delta")
    if deltas is None:
        raise ValueError(f"no deltas under {path}")
    max_bid = deltas.agg(F.max("batch_id")).first()[0]
    _fold_partials(spark, path).write.mode("overwrite").parquet(
        f"{path}/base/upto={max_bid}"
    )
    n_keys = spark.read.parquet(f"{path}/base/upto={max_bid}").count()
    return {"upto": int(max_bid), "keys": int(n_keys)}


def vacuum_agg_mv(path: str) -> dict:
    """Retire state the read rule can no longer see: delta layers with
    `batch_id <=` the newest base's `upto`, and every base layer older
    than the newest. Pure directory surgery — safe to run any time
    after a compaction lands, because the read rule already ignores
    everything this deletes. Returns counts for scheduler logging."""
    import glob
    import re
    import shutil

    bases = sorted(
        glob.glob(f"{path}/base/upto=*"),
        key=lambda p: int(re.search(r"upto=(\d+)", p).group(1)),
    )
    if not bases:
        return {"deltas_removed": 0, "bases_removed": 0}
    upto = int(re.search(r"upto=(\d+)", bases[-1]).group(1))
    n_d = n_b = 0
    for d in glob.glob(f"{path}/delta/batch_id=*"):
        if int(re.search(r"batch_id=(\d+)", d).group(1)) <= upto:
            shutil.rmtree(d, ignore_errors=True)
            n_d += 1
    for b in bases[:-1]:
        shutil.rmtree(b, ignore_errors=True)
        n_b += 1
    return {"deltas_removed": n_d, "bases_removed": n_b}
