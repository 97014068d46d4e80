"""Sliding-window pattern detection: up-streaks and gap-ups.

Reference parity (SURVEY.md §2.5):
- W5 `detect_consecutive_ups` — `algorithms/patterns.py:28-148`
- W6 `detect_gap_ups`         — `algorithms/patterns.py:155-264`
- A5/A6/A13 counts & histograms — `algorithms/patterns.py:88-141, 220-232`

Semantics pinned from the reference:
- `ups[i] = 1 iff close[i] > close[i-1]` for i ≥ 1 (length n−1).
- `gaps[i] = 1 iff open[i] > high[i-1]` for i ≥ 1.
- W5 counts maximal runs of 1s inside EVERY sliding window of size w
  over the ups array; runs crossing a window border are truncated and
  re-counted per window, so frequencies overlap across windows
  (`patterns.py:106-141`). That exact histogram has no SQL idiom →
  `applyInPandas` per symbol (SURVEY.md §7.3). The GLOBAL run-length
  histogram (no windows) is pure SQL via the difference-of-row-numbers
  run-length encoding and is the oracle-checkable variant.
- W6's per-window gap count is a plain bounded-frame sum — pure built-ins.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def _series_w():
    return Window.partitionBy("symbol").orderBy("date")


def up_flags(bars: DataFrame) -> DataFrame:
    """Binarize per-symbol daily closes into up/not-up (rows i ≥ 1)."""
    prev = F.lag("close").over(_series_w())
    return (
        bars.withColumn("up", (F.col("close") > prev).cast("int"))
        .withColumn("_rn", F.row_number().over(_series_w()))
        .filter(F.col("_rn") > 1)
        .select("symbol", "date", "up", (F.col("_rn") - 1).alias("pos"))
    )


def gap_flags(bars: DataFrame) -> DataFrame:
    """Binarize gap-ups: open[i] > high[i-1] (rows i ≥ 1)."""
    prev_high = F.lag("high").over(_series_w())
    return (
        bars.withColumn("gap", (F.col("open") > prev_high).cast("int"))
        .withColumn("_rn", F.row_number().over(_series_w()))
        .filter(F.col("_rn") > 1)
        .select("symbol", "date", "gap", (F.col("_rn") - 1).alias("pos"))
    )


def global_streak_histogram(bars: DataFrame) -> DataFrame:
    """Per-symbol histogram of maximal runs of consecutive up-days.

    Run-length encoding via the difference-of-row-numbers idiom: within
    a symbol, `pos − row_number()` is constant across a maximal run of
    up==1 rows. Two window passes + two aggregations, all JVM-side.
    """
    ups = up_flags(bars).filter(F.col("up") == 1)
    grp_w = Window.partitionBy("symbol").orderBy("pos")
    runs = (
        ups.withColumn("grp", F.col("pos") - F.row_number().over(grp_w))
        .groupBy("symbol", "grp")
        .agg(F.count(F.lit(1)).alias("streak_length"))
    )
    return (
        runs.groupBy("symbol", "streak_length")
        .agg(F.count(F.lit(1)).alias("frequency"))
    )


def windowed_streak_histogram(bars: DataFrame, window_size: int) -> DataFrame:
    """W5 exact semantics: truncated-run histogram over every window.

    For each symbol: slide a window of `window_size` over the ups array;
    in each window count maximal runs of 1s (border-truncated);
    accumulate {run_length: frequency}. Python is unavoidable here
    (overlapping, re-counted windows); it runs as one Arrow-batched
    `applyInPandas` task per symbol — the time dimension per symbol is
    bounded (~250 rows/year), so per-task cost stays flat no matter how
    many symbols the cluster holds.
    """
    ups = up_flags(bars)

    def per_symbol(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("pos")
        arr = pdf["up"].fillna(0).astype(int).tolist()
        sym = pdf["symbol"].iloc[0]
        freq: dict[int, int] = {}
        n = len(arr)
        if n >= window_size:
            for start in range(0, n - window_size + 1):
                run = 0
                for val in arr[start : start + window_size]:
                    if val == 1:
                        run += 1
                    elif run:
                        freq[run] = freq.get(run, 0) + 1
                        run = 0
                if run:
                    freq[run] = freq.get(run, 0) + 1
        out = pd.DataFrame(
            {
                "symbol": sym,
                "streak_length": list(freq.keys()),
                "frequency": list(freq.values()),
            }
        )
        return out.astype(
            {"symbol": "int64", "streak_length": "int32", "frequency": "int64"}
        )

    return ups.groupBy("symbol").applyInPandas(
        per_symbol, schema="symbol long, streak_length int, frequency long"
    )


def streak_stats(bars: DataFrame, window_size: int) -> DataFrame:
    """W5 scalar outputs: max_streak, total_ups, total_windows.

    `max_streak` (max run seen inside any window) equals
    min(global max run, window_size) because every run ≤ w fits wholly
    in some window and longer runs are truncated to w — derivable
    without the windowed UDF.
    """
    ups = up_flags(bars)
    totals = ups.groupBy("symbol").agg(
        F.sum("up").alias("total_ups"),
        F.greatest(
            F.count(F.lit(1)) - F.lit(window_size - 1), F.lit(0)
        ).alias("total_windows"),
    )
    run_max = (
        global_streak_histogram(bars)
        .groupBy("symbol")
        .agg(F.max("streak_length").alias("max_run"))
    )
    return (
        totals.join(run_max, "symbol", "left")
        .withColumn(
            "max_streak",
            F.when(F.col("total_windows") == 0, F.lit(0)).otherwise(
                F.coalesce(F.least(F.col("max_run"), F.lit(window_size)), F.lit(0))
            ),
        )
        .select("symbol", "total_ups", "total_windows", "max_streak")
    )


def gap_up_windows(bars: DataFrame, window_size: int) -> DataFrame:
    """W6: per-window trailing gap counts (rows where a full window exists)."""
    gaps = gap_flags(bars)
    w = Window.partitionBy("symbol").orderBy("pos")
    frame = w.rowsBetween(-(window_size - 1), 0)
    return (
        gaps.withColumn("gaps_in_window", F.sum("gap").over(frame))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") >= window_size)
        .select("symbol", "date", "gaps_in_window")
    )


def gap_stats(bars: DataFrame, window_size: int) -> DataFrame:
    """W6/A6 scalars: total gaps, gap dates, max gaps in any window."""
    gaps = gap_flags(bars)
    totals = gaps.groupBy("symbol").agg(
        F.sum("gap").alias("total_gaps"),
        F.sort_array(
            F.collect_list(F.when(F.col("gap") == 1, F.col("date")))
        ).alias("gap_dates"),
    )
    per_window = (
        gap_up_windows(bars, window_size)
        .groupBy("symbol")
        .agg(F.max("gaps_in_window").alias("max_gaps_in_window"))
    )
    return totals.join(per_window, "symbol", "left")
