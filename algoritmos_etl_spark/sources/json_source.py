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


# ---------------------------------------------------------------------------
# S1 live-fetch semantics (driver-side, engine-independent)
# ---------------------------------------------------------------------------
# The reference's fetch loop (`etl/data_fetcher.py:104-121, 256-320`)
# is a DRIVER concern — at scale you fetch once, land raw payloads, and
# parse with the cluster (the functions above). These utilities preserve
# its exact acquisition semantics with the transport injected, so the
# policy is testable without a network and reusable against any source:
#   - retry ONLY timeout-class failures, fixed delay, bounded attempts
#     (other errors re-raise immediately — reference :110-121);
#   - a fixed inter-request sleep as the rate limit (:282, :314);
#   - per-symbol failures tolerated, job fails only below `min_success`
#     parsed symbols (:286-320 — the S2 policy's acquisition half).


def fetch_with_retry(
    fetch,
    url: str,
    max_attempts: int = 3,
    retry_delay: float = 2.0,
    sleep=None,
):
    """Run `fetch(url)` up to `max_attempts` times, retrying ONLY
    timeout-class errors after `retry_delay` seconds; any other error
    propagates immediately (reference `etl/data_fetcher.py:104-121`)."""
    import time as _time

    do_sleep = sleep if sleep is not None else _time.sleep
    last_err: Exception | None = None
    for attempt in range(max_attempts):
        try:
            return fetch(url)
        except Exception as e:  # noqa: BLE001 — transport errors are opaque
            last_err = e
            msg = str(e).lower()
            is_timeout = "timed out" in msg or "timeout" in msg
            if is_timeout and attempt < max_attempts - 1:
                do_sleep(retry_delay)
                continue
            raise
    raise last_err  # unreachable; keeps type-checkers honest


def fetch_multiple(
    fetch,
    symbol_urls: dict,
    min_success: int = 20,
    delay_seconds: float = 0.3,
    max_attempts: int = 3,
    retry_delay: float = 2.0,
    sleep=None,
):
    """S2 acquisition loop: fetch every symbol's payload, tolerating
    per-symbol failures, sleeping `delay_seconds` between requests
    (rate limit), and failing the whole batch only when fewer than
    `min_success` symbols succeeded. Returns {symbol: payload} for the
    successes (reference `etl/data_fetcher.py:286-320`)."""
    import time as _time

    do_sleep = sleep if sleep is not None else _time.sleep
    payloads, errors = {}, {}
    for symbol, url in symbol_urls.items():
        try:
            payloads[symbol] = fetch_with_retry(
                fetch, url, max_attempts=max_attempts,
                retry_delay=retry_delay, sleep=do_sleep,
            )
        except Exception as e:  # noqa: BLE001
            errors[symbol] = e
        do_sleep(delay_seconds)
    if len(payloads) < min_success:
        raise ValueError(
            f"only {len(payloads)}/{len(symbol_urls)} symbols fetched "
            f"successfully (require ≥ {min_success}); "
            f"failures: {sorted(errors)}"
        )
    return payloads


def urllib_fetch(url: str, timeout: float = 10.0) -> str:
    """The default REAL transport: stdlib urllib GET returning the
    decoded response body. Timeouts surface as `URLError('timed out')`
    for connect-phase failures and as `TimeoutError`/`socket.timeout`
    for read-phase stalls — both carry a "timed out" message, which is
    what `fetch_with_retry` classifies as retryable (catch both if
    handling manually). HTTP error statuses raise immediately
    (HTTPError), the reference's non-retryable class
    (`etl/data_fetcher.py:110-121`).

    Injected as `fetch=urllib_fetch` into `fetch_with_retry` /
    `fetch_multiple`; tests drive it against a localhost http.server,
    production callers against their API — the policy code never
    changes.
    """
    import urllib.request

    req = urllib.request.Request(
        url, headers={"User-Agent": "algoritmos-etl-spark/1.0"}
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        charset = resp.headers.get_content_charset() or "utf-8"
        return resp.read().decode(charset)
