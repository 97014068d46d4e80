"""S1 chart-JSON replay source tests (offline payload fixture, the
reference's own test strategy: `etl/data_fetcher.py:327-360`)."""

from __future__ import annotations

import json

import pytest

from algoritmos_etl_spark.sources.json_source import (
    assert_min_success,
    parse_chart_payloads,
    read_chart_payloads,
)


def _payload(symbol, ts, quote):
    return {
        "chart": {
            "result": [
                {
                    "meta": {"symbol": symbol},
                    "timestamp": ts,
                    "indicators": {"quote": [quote]},
                }
            ],
            "error": None,
        }
    }


@pytest.fixture(scope="module")
def payload_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("payloads")
    good = _payload(
        "AAA",
        [1709251200, 1709337600],  # 2024-03-01, 2024-03-02
        {
            "open": [10.0, 11.0],
            "high": [10.5, 11.5],
            "low": [9.5, 10.5],
            "close": [10.2, 11.2],
            "volume": [1000, 1100],
        },
    )
    # short close array: positions past the end must null-pad (F7)
    padded = _payload(
        "BBB",
        [1709251200, 1709337600],
        {
            "open": [20.0, 21.0],
            "high": [20.5, 21.5],
            "low": [19.5, 20.5],
            "close": [20.2],
            "volume": [2000, 2100],
        },
    )
    failed = {"chart": {"result": None, "error": {"code": "Not Found", "description": "no data"}}}
    for name, doc in [("a.json", good), ("b.json", padded), ("c.json", failed)]:
        (d / name).write_text(json.dumps(doc))
    return str(d)


def test_parse_bars(spark, payload_dir):
    bars = parse_chart_payloads(read_chart_payloads(spark, payload_dir))
    rows = {(r.symbol, str(r.date)): r for r in bars.collect()}
    assert len(rows) == 4  # 2 symbols x 2 days; failed payload dropped
    r = rows[("AAA", "2024-03-01")]
    assert (r.open, r.high, r.low, r.close, r.volume) == (10.0, 10.5, 9.5, 10.2, 1000)


def test_short_arrays_null_pad(spark, payload_dir):
    bars = parse_chart_payloads(read_chart_payloads(spark, payload_dir))
    r = {(x.symbol, str(x.date)): x for x in bars.collect()}[("BBB", "2024-03-02")]
    assert r.close is None and r.volume == 2100


def test_min_success_policy(spark, payload_dir):
    bars = parse_chart_payloads(read_chart_payloads(spark, payload_dir))
    assert_min_success(bars, 2)
    with pytest.raises(ValueError, match="only 2 symbols"):
        assert_min_success(bars, 3)
