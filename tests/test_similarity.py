"""Pins similarity metrics to the reference's self-test vectors.

FIXTURES.md F3 = `algorithms/similarity.py:613-652`:
a=[1..5], b=a, c=reversed, d=noisy; euclidean(a,b)=0, pearson(a,b)=1,
pearson(a,c)=−1, cosine(a,b)=1, dtw(a,b)=0. The engine applies metrics
to aligned log-returns in the bundle path, so the raw-vector pins are
tested through `dtw_pairs(use_returns=False)` and a direct agg.
"""

import datetime
import math

import pytest
from pyspark.sql import functions as F

from algoritmos_etl_spark.operators import similarity

A = [1.0, 2.0, 3.0, 4.0, 5.0]
B = [1.0, 2.0, 3.0, 4.0, 5.0]
C = [5.0, 4.0, 3.0, 2.0, 1.0]
D = [1.1, 2.2, 2.8, 4.1, 5.2]


@pytest.fixture(scope="module")
def vec_bars(spark):
    rows = []
    for sym, series in [(1, A), (2, B), (3, C), (4, D)]:
        for i, v in enumerate(series):
            rows.append((sym, datetime.date(2024, 1, i + 1), v))
    return spark.createDataFrame(rows, "symbol long, date date, close double").cache()


def _metrics_on_raw(spark, x, y):
    rows = [(xi, yi) for xi, yi in zip(x, y)]
    df = spark.createDataFrame(rows, "a double, b double")
    a, b = F.col("a"), F.col("b")
    return df.agg(
        F.sqrt(F.sum((a - b) * (a - b))).alias("euclidean"),
        F.coalesce(F.corr(a, b), F.lit(0.0)).alias("pearson"),
        F.coalesce(
            F.sum(a * b) / (F.sqrt(F.sum(a * a)) * F.sqrt(F.sum(b * b))), F.lit(0.0)
        ).alias("cosine"),
    ).collect()[0]


def test_reference_pinned_vectors(spark):
    m_ab = _metrics_on_raw(spark, A, B)
    assert m_ab["euclidean"] == pytest.approx(0.0)
    assert m_ab["pearson"] == pytest.approx(1.0)
    assert m_ab["cosine"] == pytest.approx(1.0)
    m_ac = _metrics_on_raw(spark, A, C)
    assert m_ac["pearson"] == pytest.approx(-1.0)


def test_dtw_identical_is_zero_and_band(spark):
    assert similarity._dtw_numpy(A, B) == pytest.approx(0.0)
    assert similarity._dtw_numpy(A, C) > 0
    # full-matrix (window=0) ≤ banded distance always
    full = similarity._dtw_numpy(A, D, window=0)
    banded = similarity._dtw_numpy(A, D)
    assert full <= banded + 1e-12


def test_dtw_known_value():
    # hand-computed: a=[1,2,3], b=[2,3,4] full-matrix DTW = |1-2|+0+0+|3-4| = 2
    assert similarity._dtw_numpy([1.0, 2.0, 3.0], [2.0, 3.0, 4.0], window=0) == pytest.approx(2.0)


def test_dtw_path_variant():
    dist, path = similarity._dtw_numpy(A, B, window=0, with_path=True)
    assert dist == pytest.approx(0.0)
    assert path[0] == (0, 0) and path[-1] == (4, 4)


def test_dtw_path_downsamples_like_reference(spark):
    """Reference parity (app.py:246-265): series stride-sampled to
    ~80 points before the full matrix, path thinned to ~60 steps."""
    import datetime

    base = datetime.date(2020, 1, 1)
    rows = []
    for sym in (1, 2):
        for i in range(401):  # 400 returns
            px = 100.0 + (i % 7) + (0.5 if sym == 2 else 0.0)
            rows.append((sym, base + datetime.timedelta(days=i), px))
    bars = spark.createDataFrame(rows, "symbol long, date date, close double")
    out = similarity.dtw_path(bars, 1, 2).collect()
    # stride = max(1, 400//80) = 5 → 80 sampled points per side
    assert max(r.i for r in out) <= 80 and max(r.j for r in out) <= 80
    # path thinned to ~60 steps (path length ≤ 2·80, step ≥ 2 → ≤ ~81)
    assert len(out) <= 90
    full = similarity.dtw_path(
        bars, 1, 2, target_points=None, path_points=None
    ).count()
    assert full > len(out)  # downsampling actually reduced the work


def test_dtw_pairs_corr_prefilter_recall(vec_bars):
    """The correlation prefilter must keep exactly the high-|corr|
    pairs and their DTW values unchanged — correlated series are the
    low-DTW candidates, so pruning by |pearson| is recall-safe for
    near-duplicate hunting."""
    full = {
        (r.sym_a, r.sym_b): r.dtw
        for r in similarity.dtw_pairs(vec_bars, use_returns=False).collect()
    }
    kept = {
        (r.sym_a, r.sym_b): r.dtw
        for r in similarity.dtw_pairs(
            vec_bars, use_returns=False, min_abs_corr=0.99
        ).collect()
    }
    # A=B identical: the |corr|=1 duplicate pair survives
    assert (1, 2) in kept
    assert kept.keys() < full.keys()  # strictly pruned
    for pair, d in kept.items():
        assert d == pytest.approx(full[pair])
    # the zero-distance (true duplicate) pair is retained
    assert kept[(1, 2)] == pytest.approx(0.0)


def test_pair_metrics_on_aligned_returns(vec_bars):
    row = similarity.pair_metrics(vec_bars, 1, 2).collect()[0]
    assert row["n_points"] == 4  # reference: len(returns) = aligned prices − 1
    assert row["euclidean"] == pytest.approx(0.0)
    assert row["pearson"] == pytest.approx(1.0)
    assert row["cosine"] == pytest.approx(1.0)


def test_dtw_pairs_on_bars(vec_bars):
    out = {
        (r["sym_a"], r["sym_b"]): r["dtw"]
        for r in similarity.dtw_pairs(vec_bars, use_returns=False).collect()
    }
    assert len(out) == 6  # C(4,2)
    assert out[(1, 2)] == pytest.approx(0.0)
    assert out[(1, 3)] > 0


def test_compare_two_assets_bundle(vec_bars):
    row = similarity.compare_two_assets(vec_bars, 1, 2).collect()[0]
    assert set(row.asDict()) == {"euclidean", "pearson", "cosine", "n_points", "dtw"}
    assert row["dtw"] == pytest.approx(0.0)


def test_correlation_heatmap_pairs(vec_bars):
    rows = similarity.correlation_heatmap(vec_bars).collect()
    pairs = {(r["sym_a"], r["sym_b"]): r["pearson"] for r in rows}
    assert len(pairs) == 6
    assert all(a < b for a, b in pairs)
    assert pairs[(1, 2)] == pytest.approx(1.0)


def test_aligned_pairs_bounded_for_global_window(bars):
    """aligned_returns uses an UN-partitioned Window.orderBy(date) —
    safe only because its input is one symbol pair's aligned dates
    (≤ one row per trading day at any corpus scale). Pin the invariant
    the safety argument rests on: no duplicate dates ever reach it."""
    aligned = similarity.aligned_pairs(bars, 0, 1)
    dup_dates = (
        aligned.groupBy("date").count().filter(F.col("count") > 1).count()
    )
    assert dup_dates == 0
    # and the row count is bounded by the calendar, not the corpus
    assert aligned.count() <= bars.select("date").distinct().count()


def test_blocked_heatmap_matches_relational(bars):
    """The blocked-matrix heatmap must reproduce the date-join heatmap
    exactly: same pair set, same n_points, pearson to 1e-6."""
    rel = {
        (r.sym_a, r.sym_b): (r.pearson, r.n_points)
        for r in similarity.correlation_heatmap(bars).collect()
    }
    blk = {
        (r.sym_a, r.sym_b): (r.pearson, r.n_points)
        for r in similarity.correlation_heatmap_blocked(bars, n_blocks=4).collect()
    }
    assert blk.keys() == rel.keys()
    for pair, (p_rel, n_rel) in rel.items():
        p_blk, n_blk = blk[pair]
        assert n_blk == n_rel, pair
        assert p_blk == pytest.approx(p_rel, abs=1e-6), pair


def test_heatmap_matches_pairwise_corr(bars):
    """Heatmap on real sf0.001 bars agrees with a directly computed pair."""
    rows = similarity.correlation_heatmap(bars).collect()
    assert rows
    some = rows[0]
    direct = (
        similarity.per_symbol_returns(bars)
        .filter(F.col("symbol").isin(some["sym_a"], some["sym_b"]))
        .groupBy("date")
        .pivot("symbol", [some["sym_a"], some["sym_b"]])
        .agg(F.first("ret"))
        .dropna()
    )
    cols = direct.columns[1:]
    expect = direct.agg(F.corr(cols[0], cols[1])).collect()[0][0]
    assert some["pearson"] == pytest.approx(expect if expect is not None else 0.0, abs=1e-9)


def test_heatmap_salted_equals_unsalted(bars):
    """salt_buckets only re-partitions the pair expansion — the result
    set must be identical to the unsalted join."""
    base = similarity.correlation_heatmap(bars)
    salted = similarity.correlation_heatmap(bars, salt_buckets=5)
    assert base.exceptAll(salted).isEmpty()
    assert salted.exceptAll(base).isEmpty()


def test_blocked_heatmap_sparsified_emission(bars):
    """min_abs_corr + top_k_per_symbol must equal the same selection
    computed from the FULL heatmap: |corr| >= τ, then keep a pair iff
    it is in either endpoint's top-k by (corr desc, partner asc)."""
    from collections import defaultdict

    from algoritmos_etl_spark.driver_queries import (
        HEATMAP_MIN_ABS_CORR,
        HEATMAP_TOP_K,
    )

    tau, k = HEATMAP_MIN_ABS_CORR, HEATMAP_TOP_K
    full = {
        (r.sym_a, r.sym_b): (r.pearson, r.n_points)
        for r in similarity.correlation_heatmap_blocked(bars, n_blocks=4).collect()
    }
    # the r9 determinism contract: BOTH emission decisions are made on
    # the 4-decimal quantized grain (a raw-corr rank boundary shrank
    # below the ~1e-9 cross-engine divergence at the 10x corpus), so
    # the reference selection quantizes identically
    neighbors = defaultdict(list)
    for (a, b), (p, n) in full.items():
        pq = round(p, 4)
        if abs(pq) >= tau:
            neighbors[a].append((pq, b))
            neighbors[b].append((pq, a))
    expected = set()
    for s, lst in neighbors.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        for p, o in lst[:k]:
            expected.add((min(s, o), max(s, o)))

    sparse = {
        (r.sym_a, r.sym_b): (r.pearson, r.n_points)
        for r in similarity.correlation_heatmap_blocked(
            bars, n_blocks=4, min_abs_corr=tau, top_k_per_symbol=k
        ).collect()
    }
    assert set(sparse) == expected
    for pair, (p, n) in sparse.items():
        assert p == pytest.approx(full[pair][0], abs=1e-9), pair
        assert n == full[pair][1], pair


def test_dtw_batch_kernel_matches_per_pair():
    """The width-P batched DP must equal the per-pair kernel exactly —
    same band, same cost, same recurrence."""
    import numpy as np

    from algoritmos_etl_spark.operators.similarity import (
        _dtw_numpy,
        _dtw_numpy_batch,
    )

    rng = np.random.default_rng(0)
    for n, m, w in [(90, 90, None), (250, 250, None), (40, 40, 0), (30, 30, 5)]:
        a = rng.normal(size=(17, n))
        b = rng.normal(size=(17, m))
        batch = _dtw_numpy_batch(a, b, window=w)
        single = np.array(
            [_dtw_numpy(a[i], b[i], window=w) for i in range(17)]
        )
        assert np.array_equal(batch, single)
