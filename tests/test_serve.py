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


def _parse_pdf(body: bytes) -> tuple[int, str]:
    """Tiny structural PDF parser: validates header/EOF, walks the xref
    table checking every object really starts at its declared offset,
    reads /Count from the page tree, and concatenates the text drawn
    by `(...) Tj` operators across all content streams. Returns
    (page_count, drawn_text)."""
    import re

    assert body.startswith(b"%PDF-1.4"), body[:16]
    assert body.rstrip().endswith(b"%%EOF")
    m = re.search(rb"startxref\s+(\d+)\s+%%EOF\s*$", body)
    assert m, "missing startxref"
    xref_pos = int(m.group(1))
    assert body[xref_pos : xref_pos + 4] == b"xref"
    lines = body[xref_pos:].split(b"\n")
    first, n_entries = map(int, lines[1].split())
    for i, line in enumerate(lines[2 : 2 + n_entries]):
        off, _gen, kind = line.split()
        if kind == b"n":
            obj_id = first + i
            at = int(off)
            assert body[at:].startswith(f"{obj_id} 0 obj".encode()), (
                f"object {obj_id} not at declared offset {at}"
            )
    count = re.search(rb"/Type /Pages [^>]*?/Count (\d+)", body)
    assert count, "no page tree"
    raw = b" ".join(re.findall(rb"\(((?:[^()\\]|\\.)*)\) Tj", body))
    text = re.sub(r"\\([()\\])", r"\1", raw.decode("latin-1"))
    return int(count.group(1)), text


def test_pdf_route_renders_valid_pdf(api):
    """S7: /export/pdf returns a structurally valid %PDF-1.4 body whose
    content streams draw the risk + patterns tables."""
    status, out = api.dispatch("/export/pdf", {})
    assert status == 200
    assert out["content_type"] == "application/pdf"
    n_pages, text = _parse_pdf(out["body"])
    assert n_pages >= 1
    for section in (
        "Risk class distribution", "Assets by volatility rank", "Pattern scan",
    ):
        assert section in text, f"missing section {section!r}"
    risk = api.risk()["assets"]
    assert str(risk[0]["symbol"]) in text
    assert any(c in text for c in ("Conservador", "Moderado", "Agresivo"))


def test_pdf_writer_paginates_and_escapes():
    """Many rows must spill onto further pages; parens/backslashes in
    cell text must survive literal-string escaping."""
    from algoritmos_etl_spark.pdf_report import PdfDoc

    doc = PdfDoc()
    doc.table(
        "Big (test) table \\ with escapes",
        ["id", "value"],
        [(i, f"row({i})") for i in range(200)],
    )
    n_pages, text = _parse_pdf(doc.render())
    assert n_pages >= 3  # ~48 rows/page at 14 pt leading
    assert "Big (test) table \\ with escapes" in text
    assert "row(199)" in text


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
