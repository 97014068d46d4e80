"""S1 chart-JSON replay source tests (offline payload fixture, the
reference's own test strategy: `etl/data_fetcher.py:327-360`)."""

from __future__ import annotations

import json

import pytest

from algoritmos_etl_spark.sources import json_source
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


# ---------------------------------------------------------------- S1 fetch policy


class _FlakyFetch:
    """Injectable transport: scripted failures, then success."""

    def __init__(self, failures_by_url):
        self.failures = dict(failures_by_url)
        self.calls = []

    def __call__(self, url):
        self.calls.append(url)
        errs = self.failures.get(url, [])
        if errs:
            raise errs.pop(0)
        return f"payload:{url}"


def test_fetch_retries_only_timeouts():
    from algoritmos_etl_spark.sources.json_source import fetch_with_retry

    sleeps = []
    f = _FlakyFetch({"u": [TimeoutError("timed out"), TimeoutError("timeout")]})
    out = fetch_with_retry(f, "u", max_attempts=3, retry_delay=2.0,
                           sleep=sleeps.append)
    assert out == "payload:u"
    assert f.calls == ["u", "u", "u"]
    assert sleeps == [2.0, 2.0]  # fixed backoff, reference parity


def test_fetch_non_timeout_fails_fast():
    from algoritmos_etl_spark.sources.json_source import fetch_with_retry

    f = _FlakyFetch({"u": [RuntimeError("HTTP error 404")]})
    with pytest.raises(RuntimeError):
        fetch_with_retry(f, "u", sleep=lambda s: None)
    assert len(f.calls) == 1  # no retry on non-timeout errors


def test_fetch_exhausts_attempts():
    from algoritmos_etl_spark.sources.json_source import fetch_with_retry

    f = _FlakyFetch({"u": [TimeoutError("timed out")] * 5})
    with pytest.raises(TimeoutError):
        fetch_with_retry(f, "u", max_attempts=3, sleep=lambda s: None)
    assert len(f.calls) == 3


def test_fetch_multiple_min_success_and_rate_limit():
    from algoritmos_etl_spark.sources.json_source import fetch_multiple

    sleeps = []
    urls = {s: f"u{s}" for s in range(5)}
    f = _FlakyFetch({"u0": [RuntimeError("HTTP error 500")]})
    got = fetch_multiple(f, urls, min_success=4, delay_seconds=0.3,
                         sleep=sleeps.append)
    assert sorted(got) == [1, 2, 3, 4]  # symbol 0 failed, tolerated
    assert sleeps.count(0.3) == 5       # rate-limit pause after every symbol
    f2 = _FlakyFetch({u: [RuntimeError("HTTP error 500")] for u in urls.values()})
    with pytest.raises(ValueError, match="min_success|require"):
        fetch_multiple(f2, urls, min_success=1, sleep=lambda s: None)


class TestRealTransport:
    """urllib_fetch against a real localhost http.server: the live
    S1/S2 acquisition path end-to-end — socket, retry-on-timeout,
    rate-limit policy, then the cluster-side parse."""

    @pytest.fixture()
    def http_server(self):
        import http.server
        import json as _json
        import threading
        import time as _time

        state = {"slow_hits": 0}

        def payload(symbol):
            return {
                "chart": {
                    "result": [
                        {
                            "meta": {"symbol": symbol},
                            "timestamp": [1704153600, 1704240000],
                            "indicators": {
                                "quote": [
                                    {
                                        "open": [1.0, 2.0],
                                        "high": [2.0, 3.0],
                                        "low": [0.5, 1.5],
                                        "close": [1.5, 2.5],
                                        "volume": [100, 200],
                                    }
                                ]
                            },
                        }
                    ],
                    "error": None,
                }
            }

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                if self.path.startswith("/slow"):
                    # first hit stalls past the client timeout; the
                    # retry succeeds
                    state["slow_hits"] += 1
                    if state["slow_hits"] == 1:
                        _time.sleep(1.2)
                if self.path.startswith("/missing"):
                    self.send_error(404)
                    return
                sym = self.path.rsplit("/", 1)[-1]
                body = _json.dumps(payload(sym)).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{srv.server_address[1]}", state
        srv.shutdown()

    def test_fetch_retry_and_min_success_over_sockets(self, spark, http_server):
        base, state = http_server
        urls = {
            "AAA": f"{base}/chart/AAA",
            "SLO": f"{base}/slow/SLO",       # times out once, retried
            "BAD": f"{base}/missing/BAD",    # 404 → tolerated failure
        }
        fetch = lambda url: json_source.urllib_fetch(url, timeout=0.5)
        payloads = json_source.fetch_multiple(
            fetch, urls, min_success=2, delay_seconds=0.0,
            retry_delay=0.0, sleep=lambda s: None,
        )
        assert set(payloads) == {"AAA", "SLO"}
        assert state["slow_hits"] == 2  # one timeout + one successful retry
        # cluster-side parse of the fetched bodies
        df = spark.read.schema(json_source.CHART_SCHEMA).json(
            spark.sparkContext.parallelize(list(payloads.values()))
        )
        bars = json_source.parse_chart_payloads(df)
        rows = bars.collect()
        assert len(rows) == 4 and {r["symbol"] for r in rows} == {"AAA", "SLO"}

    def test_min_success_violation_raises(self, http_server):
        base, _ = http_server
        fetch = lambda url: json_source.urllib_fetch(url, timeout=0.5)
        with pytest.raises(ValueError, match="require"):
            json_source.fetch_multiple(
                fetch, {"BAD": f"{base}/missing/BAD"}, min_success=1,
                delay_seconds=0.0, sleep=lambda s: None,
            )
