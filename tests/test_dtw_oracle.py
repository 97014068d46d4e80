"""The DuckDB wavefront DTW oracle ≡ the NumPy dynamic program.

The registry's dtw_pairs / dtw_path_pair oracles express the DTW DP as
an anti-diagonal recursive CTE (driver_queries.py). These property
tests pin that formulation to `similarity._dtw_numpy` on arbitrary
series — independent of the test corpus — so corpus drift can never
mask an oracle bug.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from algoritmos_etl_spark.operators.similarity import _dtw_numpy

INF = "1e300"


def _wavefront_distance(ra: list[float], rb: list[float]) -> float:
    """Run the same recursive-CTE wavefront the registry oracle uses,
    on explicit series."""
    n, m = len(ra), len(rb)
    if n == 0 or m == 0:
        return 0.0
    sql = f"""
    WITH RECURSIVE dims AS (
        SELECT CAST(? AS DOUBLE[]) AS ra, CAST(? AS DOUBLE[]) AS rb,
               {n} AS n, {m} AS m,
               greatest(greatest(10, greatest({n}, {m}) // 4), abs({n} - {m})) AS w
    ),
    dp AS (
        SELECT ra, rb, n, m, w, 0 AS d,
               list_prepend(0.0, list_transform(range(n), x -> {INF})) AS diag1,
               list_transform(range(n + 1), x -> {INF}) AS diag2
        FROM dims
        UNION ALL
        SELECT ra, rb, n, m, w, d + 1 AS d,
               list_transform(range(1, n + 2), p -> CASE
                   WHEN p = 1 THEN {INF}
                   WHEN (d + 1) - (p - 1) < 1 OR (d + 1) - (p - 1) > m THEN {INF}
                   WHEN abs((p - 1) - ((d + 1) - (p - 1))) > w THEN {INF}
                   ELSE abs(ra[p - 1] - rb[(d + 1) - (p - 1)])
                        + least(diag1[p - 1], diag1[p], diag2[p - 1])
               END) AS diag1,
               diag1 AS diag2
        FROM dp WHERE d < n + m
    )
    SELECT diag1[n + 1] FROM dp WHERE d = n + m
    """
    return duckdb.execute(sql, [ra, rb]).fetchone()[0]


series = st.lists(
    st.floats(min_value=-5, max_value=5, allow_nan=False, width=32),
    min_size=0,
    max_size=28,
)


@settings(max_examples=60, deadline=None)
@given(series, series)
def test_wavefront_equals_numpy_dp(ra, rb):
    want = _dtw_numpy(ra, rb, window=None)
    got = _wavefront_distance(ra, rb)
    assert got == pytest.approx(want, rel=1e-12, abs=1e-12)


def test_wavefront_band_clips_like_numpy():
    # length mismatch wider than the base band: w widens to |n-m|
    ra = [float(i % 7) for i in range(25)]
    rb = [float((i * 3) % 5) for i in range(6)]
    assert _wavefront_distance(ra, rb) == pytest.approx(
        _dtw_numpy(ra, rb, window=None), rel=1e-12
    )
