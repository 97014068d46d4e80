"""Serving-demo tests: every reference API route answers with the
engine's numbers through the framework-free dispatch core."""

from __future__ import annotations

import json

import pytest

from algoritmos_etl_spark.serve import JsonApi

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def api(spark):
    return JsonApi(spark, SF_DIR)


def test_symbols_route(api):
    status, out = api.dispatch("/api/symbols", {})
    assert status == 200
    assert out["symbols"] == sorted(out["symbols"]) and out["symbols"]


def test_similarity_route_and_validation(api):
    status, out = api.dispatch("/api/similarity", {"a": "0", "b": "1"})
    assert status == 200
    assert {"euclidean", "pearson", "cosine", "dtw", "n_points"} <= set(out)
    status, out = api.dispatch("/api/similarity", {"a": "0", "b": "999999"})
    assert status == 400 and "error" in out
    status, out = api.dispatch("/api/similarity", {"a": "0"})
    assert status == 400


def test_heatmap_route(api):
    status, out = api.dispatch("/api/heatmap", {})
    assert status == 200
    assert all(p["sym_a"] < p["sym_b"] for p in out["pairs"])


def test_candlestick_route_thinned(api):
    status, out = api.dispatch("/api/candlestick/0", {})
    assert status == 200
    assert out["bars"] and all("close" in b for b in out["bars"])


def test_patterns_route(api):
    status, out = api.dispatch("/api/patterns/0", {})
    assert status == 200
    assert "total_ups" in out["streaks"] and "total_gaps" in out["gaps"]


def test_risk_route(api):
    status, out = api.dispatch("/api/risk", {})
    assert status == 200
    ranks = [a["rank"] for a in out["assets"]]
    assert ranks == sorted(ranks)
    assert all(a["risk_class"] in ("Conservador", "Moderado", "Agresivo")
               for a in out["assets"])


def test_unknown_route_404(api):
    status, out = api.dispatch("/api/nope", {})
    assert status == 404


def test_payloads_json_serializable(api):
    for path in ("/api/symbols", "/api/heatmap", "/api/risk"):
        _, out = api.dispatch(path, {})
        json.dumps(out)  # must not raise


def test_report_route_renders_html(api):
    """S7 stand-in: /export/report renders the risk + patterns result
    DataFrames into one standalone HTML document."""
    status, out = api.dispatch("/export/report", {})
    assert status == 200
    assert out["content_type"] == "text/html"
    body = out["body"]
    assert body.startswith("<!DOCTYPE html>")
    for section in (
        "Risk class distribution", "Assets by volatility rank", "Pattern scan",
    ):
        assert section in body
    # one data row per asset in the rank table, classes from the X4 pipeline
    risk = api.risk()["assets"]
    assert f"<td>{risk[0]['symbol']}</td>" in body
    assert any(c in body for c in ("Conservador", "Moderado", "Agresivo"))
