"""Deterministic sampling & splits for training-data pipelines.

`df.sample()` is seed-dependent per partitioning and not reproducible
across engines or re-partitions; training pipelines need splits that
are a PURE FUNCTION of the record key — stable under reruns, engine
changes, and data re-layout, and leakage-safe (a document's split never
changes when the corpus grows). Standard trick: hash the key, bucket
mod N, threshold the bucket. All md5-prefix arithmetic here, so the
DuckDB oracle reproduces splits exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import token_hash

SPLIT_BUCKETS = 10_000


def split_bucket(key: Column, salt: str = "split") -> Column:
    """Stable bucket in [0, SPLIT_BUCKETS) from the record key."""
    return F.pmod(token_hash(F.lit(salt), key.cast("string")), F.lit(SPLIT_BUCKETS))


def with_split(
    df: DataFrame,
    key: str,
    train_frac: float = 0.8,
    valid_frac: float = 0.1,
    salt: str = "split",
) -> DataFrame:
    """Adds a `split` column: train / valid / test by hash bucket.

    Fractions are exact over the bucket space (e.g. 0.8 → buckets
    0-7999); actual row proportions converge to the fractions by the
    hash's uniformity. No shuffle — one projection.
    """
    b = split_bucket(F.col(key), salt)
    train_hi = int(train_frac * SPLIT_BUCKETS)
    valid_hi = train_hi + int(valid_frac * SPLIT_BUCKETS)
    return df.withColumn(
        "split",
        F.when(b < train_hi, F.lit("train"))
        .when(b < valid_hi, F.lit("valid"))
        .otherwise(F.lit("test")),
    )


def deterministic_sample(
    df: DataFrame, key: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep ~`fraction` of rows, chosen by key hash — the same rows
    every run, on every engine, at any partitioning."""
    thresh = int(fraction * SPLIT_BUCKETS)
    return df.filter(split_bucket(F.col(key), salt) < thresh)


def stride_sample(
    df: DataFrame,
    partition_col: str,
    order_cols: list[str],
    max_points: int = 200,
) -> DataFrame:
    """O15 stride downsampling (reference `app.py:215-229`): keep every
    step-th row per series, step = max(1, len // max_points) — the
    chart-thinning idiom `sample_list(lst, step)` as a relational op.

    One window pass per series: position and series length come from
    the same partition window, the modulo filter is a pure projection.
    Row 0 of every series is always kept (like `lst[::step]`).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(partition_col).orderBy(*order_cols)
    cnt_w = Window.partitionBy(partition_col)
    step = F.greatest(
        F.lit(1), F.floor(F.count(F.lit(1)).over(cnt_w) / F.lit(max_points))
    )
    return (
        df.withColumn("_pos", F.row_number().over(w) - 1)
        .withColumn("_step", step)
        .filter(F.col("_pos") % F.col("_step") == 0)
        .drop("_pos", "_step")
    )
