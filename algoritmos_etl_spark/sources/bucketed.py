"""Bucketed-table writes: pre-shuffle once, join shuffle-free forever.

At 100 TB the same big-to-big join key (doc_id, user_id, symbol) recurs
across every pipeline run; bucketing pays the shuffle ONCE at write
time and every later equi-join on the bucket key is exchange-free (the
scan itself is the distribution). This is `spark-warehouse` bucketing —
the same mechanism Hive/Trino interop relies on — so the layout
survives sessions, unlike repartition() which only shapes one plan.

Rules the planner enforces (pinned in tests/test_plans.py):
- both sides bucketed by the SAME keys with compatible bucket counts;
- bucket column list == join key list (prefix matches don't count);
- sortBy on the bucket key additionally removes the sort before a
  sort-merge join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist `df` as a parquet table bucketed (and bucket-sorted) by
    `keys`. Size `n_buckets` so one bucket's rows fit an executor task
    at the target scale — buckets are the join's parallelism unit."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, keys[0], *keys[1:])
    )
    if sort:
        w = w.sortBy(keys[0], *keys[1:])
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — bucketing metadata rides along automatically."""
    return spark.table(table)
