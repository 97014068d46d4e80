"""End-to-end ETL lifecycle: the reference's `run_etl` as ONE lazy DAG.

Reference parity (SURVEY.md §3.1, `etl/etl_pipeline.py:82-312`): the
reference fetches per asset, then loops assets through detect-missing →
detect-inconsistencies → forward-fill → drop-invalid, then unifies into
a wide CSV, printing a report. Here the whole lifecycle is one
declarative DataFrame graph — Catalyst fuses the cleaning predicates
into the scan, the only shuffles are the bars aggregation and the
alignment join, and "one asset at a time" becomes partition parallelism.

Sinks (S4): long-format parquet (the engine-canonical shape) and the
reference's wide CSV view (1 + 5k columns, export edge only).

Report numbers mirror `etl_pipeline.py:284-312`: per-symbol row/null
counts before cleaning, rows after, calendar span.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators import alignment, cleaning
from ..sources.readers import daily_bars, load_table


def run_etl(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    write_wide_csv: bool = True,
    max_wide_symbols: int = 50,
) -> dict:
    """events → bars → clean → align → parquet (+ wide CSV). Returns a
    small report dict (everything in it is aggregate-sized)."""
    bars = daily_bars(load_table(spark, sf_dir, "events"))

    missing = cleaning.missing_value_summary(bars)
    filled = cleaning.forward_fill(bars)
    valid = cleaning.remove_invalid_rows(filled)
    aligned = alignment.align_to_calendar(valid)

    # Hive-partition the master by year: date-range queries then prune
    # whole directories at planning time (PartitionFilters in the scan,
    # pinned by tests/test_plans.py). Year is the right granularity —
    # low cardinality, aligned with the dominant predicate shape; daily
    # partitions would mean millions of tiny files at 100 TB.
    aligned.withColumn("year", F.year("date")).repartition("year").write.mode(
        "overwrite"
    ).partitionBy("year").parquet(f"{out_dir}/master_long.parquet")

    n_symbols = valid.select("symbol").distinct().count()
    if write_wide_csv:
        # wide export: cap columns like the reference caps assets (k=20);
        # the long parquet above is the complete dataset.
        symbols = [
            r.symbol
            for r in valid.select("symbol")
            .distinct()
            .orderBy("symbol")
            .limit(max_wide_symbols)
            .collect()
        ]
        wide = alignment.to_wide(
            aligned.filter(F.col("symbol").isin(symbols)), symbols=symbols
        )
        wide.orderBy("date").coalesce(1).write.mode("overwrite").option(
            "header", True
        ).csv(f"{out_dir}/master_wide_csv")

    cal = aligned.agg(
        F.min("date").alias("first_date"),
        F.max("date").alias("last_date"),
        F.count_distinct("date").alias("n_dates"),
    ).first()
    null_cols = [c for c in missing.columns if c.startswith("null_")]
    null_cells = (
        missing.agg(
            F.sum(sum((F.col(c) for c in null_cols), F.lit(0))).alias("s")
        ).first().s
        or 0
    )
    return {
        "n_symbols": n_symbols,
        "n_dates": cal.n_dates,
        "first_date": str(cal.first_date),
        "last_date": str(cal.last_date),
        "rows_long": aligned.count(),
        "null_cells_before_clean": int(null_cells),
    }
