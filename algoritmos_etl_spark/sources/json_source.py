"""S1: chart-API JSON replay source.

Reference parity (SURVEY.md §2.1 S1/S2, §2.8 F10): the reference GETs
the Yahoo Chart API v8 and hand-parses its columnar JSON — parallel
arrays `timestamp[]` + `indicators.quote[0].{open,high,low,close,
volume}[]`, padded with nulls when short (`etl/data_fetcher.py:124-283`).

The engine ingests *saved* payloads (one JSON document per symbol):
HTTP fetch/retry/rate-limit is a driver-side concern outside the query
engine; replaying from object storage is also what you would do at
scale (fetch once, land raw, parse with the cluster). The parse is
schema-on-read + `arrays_zip` + `explode` — the reference's 180 lines
of index-juggling become one JVM-side expression; array padding (F7)
falls out of `arrays_zip`'s null semantics (shorter arrays pad with
null, exactly the reference's `pad_to`).

S2's min-success policy (`fetch_multiple_assets`, tolerate per-symbol
failures but require ≥ k parsed symbols) maps to a distinct-count
assertion over the parsed result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Explicit payload schema: schema inference costs an extra pass and
# breaks on all-null quote arrays.
CHART_SCHEMA = (
    "chart struct<result: array<struct<"
    "meta: struct<symbol: string>, "
    "timestamp: array<bigint>, "
    "indicators: struct<quote: array<struct<"
    "open: array<double>, high: array<double>, low: array<double>, "
    "close: array<double>, volume: array<bigint>>>>>>, "
    "error: struct<code: string, description: string>>"
)


def read_chart_payloads(spark: SparkSession, path: str) -> DataFrame:
    """Raw payload documents (one per line/file) with explicit schema."""
    return spark.read.schema(CHART_SCHEMA).json(path)


def parse_chart_payloads(payloads: DataFrame) -> DataFrame:
    """Columnar chart JSON → long bars (symbol, date, OHLCV).

    `arrays_zip` aligns the six parallel arrays positionally (short
    arrays null-pad — F7), `explode` turns positions into rows, and the
    date derives from the unix timestamp (F1). Failed payloads
    (`error` set / empty result) drop out via the inner explode.
    """
    result = payloads.select(
        F.explode(F.col("chart.result")).alias("r")
    ).select(
        F.col("r.meta.symbol").alias("symbol"),
        F.arrays_zip(
            F.col("r.timestamp").alias("ts"),
            F.col("r.indicators.quote")[0]["open"].alias("open"),
            F.col("r.indicators.quote")[0]["high"].alias("high"),
            F.col("r.indicators.quote")[0]["low"].alias("low"),
            F.col("r.indicators.quote")[0]["close"].alias("close"),
            F.col("r.indicators.quote")[0]["volume"].alias("volume"),
        ).alias("bars"),
    )
    exploded = result.select("symbol", F.explode("bars").alias("b"))
    return exploded.select(
        "symbol",
        F.to_date(F.timestamp_seconds(F.col("b.ts"))).alias("date"),
        F.col("b.open").alias("open"),
        F.col("b.high").alias("high"),
        F.col("b.low").alias("low"),
        F.col("b.close").alias("close"),
        F.col("b.volume").alias("volume"),
    )


def assert_min_success(bars: DataFrame, min_symbols: int) -> DataFrame:
    """S2 policy: fail the job unless ≥ `min_symbols` symbols parsed."""
    n = bars.select("symbol").distinct().count()
    if n < min_symbols:
        raise ValueError(
            f"only {n} symbols parsed successfully (require ≥ {min_symbols})"
        )
    return bars
