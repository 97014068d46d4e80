"""Vector search tests: brute-force correctness, LSH recall pins.

LSH is approximate BY DESIGN — these tests pin the recall/precision
contract, not exact output: precision 1.0 (exact verification pass),
recall above the analytic expectation for the chosen (tables, planes).
"""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from algoritmos_etl_spark.operators import vectors
from algoritmos_etl_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


def test_cosine_topk_self_excluded_and_ranked(emb):
    out = vectors.cosine_topk(emb, [0, 1], k=5).collect()
    assert all(r.neighbor_id != r.query_id for r in out)
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for rows in by_q.values():
        assert [r.rank for r in rows] == sorted(r.rank for r in rows)
        cosines = [r.cosine for r in sorted(rows, key=lambda r: r.rank)]
        assert cosines == sorted(cosines, reverse=True)


def test_lsh_topk_recall_vs_bruteforce(emb):
    k = 10
    exact = {
        (r.query_id, r.neighbor_id)
        for r in vectors.cosine_topk(emb, [0, 1, 2, 3, 4], k=k).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in vectors.lsh_topk(emb, [0, 1, 2, 3, 4], k=k).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"single-bucket ANN recall collapsed: {recall}"


def _analytic_recall(cosines, n_tables, planes):
    """Expected banding recall from the true pairs' own cosines:
    p(c) = 1 − acos(c)/π per plane, 1 − (1 − p^b)^T overall."""
    if not cosines:
        return 1.0
    total = 0.0
    for c in cosines:
        p = 1 - math.acos(min(c, 1.0)) / math.pi
        total += 1 - (1 - p**planes) ** n_tables
    return total / len(cosines)


def test_lsh_neardup_recall_and_precision(emb):
    exact = {
        (r.vec_a, r.vec_b): r.cosine
        for r in vectors.cosine_neardup_pairs(emb, threshold=0.4).collect()
    }
    lsh = {
        (r.vec_a, r.vec_b): r.cosine
        for r in vectors.lsh_neardup_pairs(emb, threshold=0.4).collect()
    }
    # precision 1.0: every LSH pair is a true pair with the same cosine
    for pair, cos in lsh.items():
        assert pair in exact and cos == pytest.approx(exact[pair])
    if exact:
        recall = len(lsh) / len(exact)
        floor = 0.5 * _analytic_recall(
            exact.values(), vectors.LSH_TABLES, vectors.LSH_PLANES_PER_TABLE
        )
        assert recall >= floor, f"recall {recall} below floor {floor}"


def test_lsh_neardup_bucket_cap(emb):
    """max_bucket_size must only DROP candidates (precision stays 1.0,
    subset of the uncapped result), and a cap larger than any bucket
    must be a no-op — the same policy as minhash_lsh_dedup's cap."""
    base = {
        (r.vec_a, r.vec_b): r.cosine
        for r in vectors.lsh_neardup_pairs(emb, threshold=0.4).collect()
    }
    capped = {
        (r.vec_a, r.vec_b): r.cosine
        for r in vectors.lsh_neardup_pairs(
            emb, threshold=0.4, max_bucket_size=8
        ).collect()
    }
    for pair, cos in capped.items():
        assert pair in base and cos == pytest.approx(base[pair])
    uncapped = {
        (r.vec_a, r.vec_b): r.cosine
        for r in vectors.lsh_neardup_pairs(
            emb, threshold=0.4, max_bucket_size=10**9
        ).collect()
    }
    assert uncapped == base


def test_lsh_width_tradeoff_curve(emb):
    """Pins the recall/candidate-count curve at the narrow (4×4) and
    wide (16×8) operating points: widening must cut the candidate set
    hard (16-value signatures held ~n/16 of the corpus per bucket),
    and empirical recall must track the analytic banding formula at
    BOTH widths — that is the evidence the hash family is healthy and
    the trade-off is the theoretical one, not an implementation bug."""
    exact = {
        (r.vec_a, r.vec_b): r.cosine
        for r in vectors.cosine_neardup_pairs(emb, threshold=0.4).collect()
    }
    n = emb.count()
    all_pairs = n * (n - 1) // 2
    for n_tables, planes in [(4, 4), (16, 8)]:
        cand = vectors.lsh_candidate_count(emb, n_tables, planes)
        got = {
            (r.vec_a, r.vec_b)
            for r in vectors.lsh_neardup_pairs(emb, 0.4, n_tables, planes).collect()
        }
        recall = len(got & set(exact)) / len(exact)
        analytic = _analytic_recall(exact.values(), n_tables, planes)
        assert 0.5 * analytic <= recall <= min(1.5 * analytic, 1.0), (
            f"T={n_tables} b={planes}: recall {recall} vs analytic {analytic}"
        )
        if (n_tables, planes) == (4, 4):
            cand_narrow = cand
        else:
            # the widening's whole point: far fewer candidate pairs
            assert cand * 2 <= cand_narrow, (cand, cand_narrow)
            assert cand <= all_pairs // 10


def test_multi_table_buckets_shape(emb):
    b = vectors.lsh_table_buckets(emb, n_tables=4, planes_per_table=4)
    n = emb.count()
    assert b.count() == 4 * n
    rng = b.agg(
        F.min("sig").alias("lo"), F.max("sig").alias("hi"),
        F.count_distinct("tbl").alias("t"),
    ).first()
    assert rng.t == 4 and 0 <= rng.lo and rng.hi <= 15


def test_ivf_topk_recall_vs_bruteforce(emb):
    k = 10
    exact = {
        (r.query_id, r.neighbor_id)
        for r in vectors.cosine_topk(emb, [0, 1, 2, 3, 4], k=k).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in vectors.ivf_topk(
            emb, [0, 1, 2, 3, 4], k=k, n_centroids=8, nprobe=3
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    # measured 0.94 at these widths on this corpus; 0.6 is the floor
    assert recall >= 0.6, f"IVF recall collapsed: {recall}"


def test_ivf_exhaustive_probe_equals_bruteforce(emb):
    """nprobe = n_centroids probes every cluster — the candidate set is
    the whole corpus, so the result must equal the exact baseline."""
    k = 10
    exact = {
        (r.query_id, r.neighbor_id)
        for r in vectors.cosine_topk(emb, [0, 1, 2], k=k).collect()
    }
    full = {
        (r.query_id, r.neighbor_id)
        for r in vectors.ivf_topk(
            emb, [0, 1, 2], k=k, n_centroids=8, nprobe=8
        ).collect()
    }
    assert full == exact


def test_ivf_assignment_partitions_corpus(emb):
    """Every vector lands in exactly one cluster, and no cluster
    degenerates to the whole corpus (the probe would be a full scan)."""
    from algoritmos_etl_spark.operators.vectors import (
        _ivf_assign, _quantized_flat, ivf_train, with_dvec,
    )

    n = emb.count()
    base = with_dvec(emb)
    flat = _quantized_flat(base, "vec_id")
    vec_norms = flat.groupBy("vec_id").agg(
        F.sum(F.col("q") * F.col("q")).alias("n2")
    )
    cents = ivf_train(emb, n_centroids=8, iters=1)
    assign = _ivf_assign(flat, vec_norms, cents)
    assert assign.count() == n
    sizes = [r.c for r in assign.groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("c")).collect()]
    assert sum(sizes) == n
    assert max(sizes) < n, "IVF assignment degenerated to one cluster"


def test_ivf_written_index_probe_matches_inline(emb, spark, tmp_path):
    """ivf_write_index + ivf_probe_topk ≡ the inline ivf_topk (same
    deterministic quantizer), and the probe's corpus scan is dynamic-
    partition-pruned on centroid_id, not a full read."""
    path = str(tmp_path / "ivf_index")
    vectors.ivf_write_index(emb, path, n_centroids=8, iters=1)
    got = vectors.ivf_probe_topk(spark, path, [0, 1, 2], k=10, nprobe=3)
    want = vectors.ivf_topk(emb, [0, 1, 2], k=10, n_centroids=8, nprobe=3)
    as_rows = lambda df: sorted(
        (r.query_id, r.neighbor_id, r.cosine, r.rank) for r in df.collect()
    )
    assert as_rows(got) == as_rows(want)
    # the partitioned layout exists and the probe plan prunes on it
    import os

    parts = [p for p in os.listdir(f"{path}/corpus") if p.startswith("centroid_id=")]
    assert len(parts) >= 2
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_lsh_neardup_empty_and_single(spark):
    """Bucket-local verification degenerates cleanly: no vectors → no
    rows; one vector → no pairs (the per-bucket guard)."""
    from algoritmos_etl_spark.operators import vectors

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert vectors.lsh_neardup_pairs(empty).count() == 0
    one = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    assert vectors.lsh_neardup_pairs(one).count() == 0


def test_kmeans_cluster_profile_partitions_corpus(emb):
    """Cluster report: sizes sum to the corpus, coherence is a valid
    cosine, and membership matches the IVF assignment it claims to
    describe."""
    from algoritmos_etl_spark.operators import vectors

    prof = vectors.kmeans_cluster_profile(emb, n_centroids=16, iters=1)
    rows = prof.collect()
    n = emb.count()
    assert sum(r.n_members for r in rows) == n
    assert 1 <= len(rows) <= 16
    assert all(-1.0 <= r.avg_cosine <= 1.0 for r in rows)
    # same quantizer as the IVF index: per-cluster min ids must agree
    # with a direct assignment through the library internals
    base = vectors.with_dvec(emb)
    flat = vectors._quantized_flat(base, "vec_id")
    from pyspark.sql import functions as F

    vec_norms = flat.groupBy("vec_id").agg(
        F.sum(F.col("q") * F.col("q")).alias("n2")
    )
    cents = vectors.ivf_train(emb, n_centroids=16, iters=1)
    assign = vectors._ivf_assign(flat, vec_norms, cents)
    direct = {
        r.centroid_id: (r.n, r.mn)
        for r in assign.groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n"), F.min("vec_id").alias("mn"))
        .collect()
    }
    assert {r.centroid_id: (r.n_members, r.min_vec_id) for r in rows} == direct


# ----------------------------------------------------------- SemDeDup

def _vec(direction, eps=0.0, dim=8):
    v = [0.0] * dim
    v[direction] = 1.0
    v[(direction + 1) % dim] = eps
    return v


def test_semantic_dedup_drops_within_cluster_dups(spark):
    # two well-separated directions; ids 0/1 seed the 2 clusters.
    # 10 ≈ 0 (cos≈1) must drop with dup_of=0; 11 ≈ 1 likewise; 20 is
    # near-orthogonal to everything → kept.
    rows = [
        (0, _vec(0)), (1, _vec(4)),
        (10, _vec(0, eps=0.01)), (11, _vec(4, eps=0.01)),
        (20, _vec(2)),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r for r in vectors.semantic_dedup(
        emb, threshold=0.95, n_centroids=2
    ).collect()}
    assert len(out) == 5
    assert not out[10].is_kept and out[10].dup_of == 0
    assert not out[11].is_kept and out[11].dup_of == 1
    assert out[0].is_kept and out[1].is_kept and out[20].is_kept
    assert out[10].cos_to_dup > 0.99
    # dropped rows reference a KEPT (or at least smaller-id) member
    for r in out.values():
        if not r.is_kept:
            assert r.dup_of < r.vec_id
            assert out[r.dup_of].centroid_id == r.centroid_id


def test_semantic_dedup_decision_matches_bruteforce(emb):
    """On the real sf0.001 corpus: every drop decision must equal the
    brute-force 'exists smaller-id cluster-mate with cos >= τ' rule."""
    import numpy as np

    tau = 0.4
    out = vectors.semantic_dedup(emb, threshold=tau).collect()
    vecs = {
        r.vec_id: np.array(r.embedding, dtype="float64")
        for r in emb.collect()
    }
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.centroid_id, []).append(r)
    n_dropped = 0
    for members in by_cluster.values():
        members.sort(key=lambda r: r.vec_id)
        for i, r in enumerate(members):
            q = np.floor(vecs[r.vec_id] * 1e6)
            expect_dup = None
            for other in members[:i]:
                p = np.floor(vecs[other.vec_id] * 1e6)
                cos = (q @ p) / (np.sqrt(q @ q) * np.sqrt(p @ p))
                if cos >= tau:
                    expect_dup = other.vec_id
                    break
            assert r.is_kept == (expect_dup is None), r
            if expect_dup is not None:
                assert r.dup_of == expect_dup
                n_dropped += 1
    assert len(out) == emb.count()  # one decision per vector


# ------------------------------------------------------ product quantization


def _np_pq_reference(vecs: dict, m=8, ks=16, query_ids=(0, 1, 2, 3, 4), k=10):
    """Independent NumPy mirror of pq_train/pq_encode/pq_topk semantics:
    floor(val·1e6) quantization, first-ks-by-id seeds, one Lloyd step
    under squared-L2 (ties → lowest code), floor(mean) codewords, ADC
    ranking ascending (adist, neighbor_id)."""
    import numpy as np

    ids = sorted(vecs)
    Q = {i: np.floor(np.asarray(vecs[i], dtype="float64") * 1e6).astype("int64")
         for i in ids}
    dim = len(Q[ids[0]])
    dsub = dim // m
    seeds = ids[:ks]

    def assign(cents):
        # cents: dict[sub] -> dict[code] -> np.array(dsub)
        codes = {}
        for i in ids:
            for sub in range(m):
                sl = Q[i][sub * dsub:(sub + 1) * dsub]
                best = min(
                    ((int(((sl - c) ** 2).sum()), code)
                     for code, c in cents[sub].items()),
                )
                codes[(i, sub)] = best[1]
        return codes

    cents0 = {
        sub: {
            code: Q[sid][sub * dsub:(sub + 1) * dsub]
            for code, sid in enumerate(seeds)
        }
        for sub in range(m)
    }
    a0 = assign(cents0)
    cents = {sub: {} for sub in range(m)}
    for sub in range(m):
        members = {}
        for i in ids:
            members.setdefault(a0[(i, sub)], []).append(
                Q[i][sub * dsub:(sub + 1) * dsub]
            )
        for code, vs in members.items():
            s = np.sum(np.stack(vs).astype("float64"), axis=0)
            cents[sub][code] = np.floor(s / len(vs)).astype("int64")
    codes = assign(cents)

    rows = []
    for qid in query_ids:
        dists = []
        for i in ids:
            if i == qid:
                continue
            d = 0
            for sub in range(m):
                sl = Q[qid][sub * dsub:(sub + 1) * dsub]
                c = cents[sub][codes[(i, sub)]]
                d += int(((sl - c) ** 2).sum())
            dists.append((d, i))
        dists.sort()
        for rank, (d, i) in enumerate(dists[:k], start=1):
            rows.append((qid, i, d, rank))
    return set(rows)


def test_pq_topk_matches_numpy_reference(emb):
    vecs = {r.vec_id: list(r.embedding) for r in emb.collect()}
    expect = _np_pq_reference(vecs)
    got = {
        (r.query_id, r.neighbor_id, r.adist, r.rank)
        for r in vectors.pq_topk(emb, [0, 1, 2, 3, 4], k=10).collect()
    }
    assert got == expect


def test_pq_codes_shape(emb):
    n = emb.count()
    cb = vectors.pq_train(emb)
    codes = vectors.pq_encode(emb, cb).collect()
    assert len(codes) == n * vectors.PQ_SUBS  # m codes per vector
    assert all(0 <= r.code < vectors.PQ_CODES for r in codes)
    # codebooks: every surviving (sub, code) cell has exactly dsub comps
    cells = {}
    for r in cb.collect():
        cells.setdefault((r.sub, r.code), set()).add(r.sidx)
    dsub = 64 // vectors.PQ_SUBS
    assert all(s == set(range(dsub)) for s in cells.values())


def test_pq_recall_vs_exact_l2(emb):
    """ADC is approximate BY DESIGN — pin the recall contract against
    exact squared-L2 top-k on the same quantized integers."""
    import numpy as np

    k = 10
    vecs = {
        r.vec_id: np.floor(np.asarray(r.embedding, dtype="float64") * 1e6)
        for r in emb.collect()
    }
    exact = set()
    for qid in (0, 1, 2, 3, 4):
        d = sorted(
            (int(((vecs[qid] - v) ** 2).sum()), i)
            for i, v in vecs.items()
            if i != qid
        )[:k]
        exact |= {(qid, i) for _, i in d}
    approx = {
        (r.query_id, r.neighbor_id)
        for r in vectors.pq_topk(emb, [0, 1, 2, 3, 4], k=k).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"PQ recall collapsed: {recall}"


# ----------------------------------------------------------------- PCA


def test_pca_matches_numpy_full_reference(emb):
    """Distributed Gram-pass PCA ≡ numpy PCA computed on the collected
    corpus — mean, covariance eigenbasis, and projections."""
    import numpy as np

    k = 4
    rows = sorted(emb.collect(), key=lambda r: r.vec_id)
    X = np.array([r.embedding for r in rows], dtype="float64")
    mean, comps, ratio = vectors.pca_fit(emb, k=k)

    assert np.allclose(mean, X.mean(axis=0), atol=1e-9)
    cov = np.cov(X, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    ref = evecs[:, order].T
    for i in range(k):  # same sign canonicalization
        j = int(np.argmax(np.abs(ref[i])))
        if ref[i, j] < 0:
            ref[i] = -ref[i]
    assert np.allclose(comps, ref, atol=1e-6)
    assert np.allclose(ratio, evals[order] / evals.sum(), atol=1e-9)

    out = vectors.pca_project(emb, k=k, fitted=(mean, comps, ratio))
    got = {r.vec_id: [r[f"pc{i}"] for i in range(1, k + 1)] for r in out.collect()}
    proj = (X - X.mean(axis=0)) @ ref.T
    for vid, r in zip((r.vec_id for r in rows), proj):
        assert np.allclose(got[vid], np.round(r, 6), atol=1e-5)


def test_pca_variance_concentrates(emb):
    _, _, ratio = vectors.pca_fit(emb, k=8)
    assert all(ratio[i] >= ratio[i + 1] - 1e-12 for i in range(len(ratio) - 1))
    assert 0 < ratio.sum() <= 1.0 + 1e-9


def test_pq_written_index_exhaustive_probe_equals_full_scan(emb, spark, tmp_path):
    """pq_write_index + pq_probe_topk with nprobe = C ≡ the inline
    full-scan pq_topk (every partition probed), and the probe plan is
    dynamic-partition-pruned on centroid_id."""
    import os

    path = str(tmp_path / "pq_index")
    vectors.pq_write_index(emb, path, n_centroids=8)
    got = vectors.pq_probe_topk(spark, path, emb, [0, 1, 2], k=10, nprobe=8)
    want = vectors.pq_topk(emb, [0, 1, 2], k=10)
    as_rows = lambda df: sorted(
        (r.query_id, r.neighbor_id, r.adist, r.rank) for r in df.collect()
    )
    assert as_rows(got) == as_rows(want)
    parts = [
        p for p in os.listdir(f"{path}/codes") if p.startswith("centroid_id=")
    ]
    assert len(parts) >= 2
    # selective probe: plan prunes partitions, results stay well-formed
    sel = vectors.pq_probe_topk(spark, path, emb, [0, 1, 2], k=10, nprobe=2)
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    rows = sel.collect()
    assert rows and all(r.rank <= 10 and r.neighbor_id != r.query_id for r in rows)
    # every probed pair carries the same ADC distance the full scan
    # assigns it — probing restricts candidates, never rescores them
    full_all = {
        (r.query_id, r.neighbor_id): r.adist
        for r in vectors.pq_topk(emb, [0, 1, 2], k=10**6).collect()
    }
    for r in rows:
        assert full_all[(r.query_id, r.neighbor_id)] == r.adist


def test_ivf_append_index_frozen_quantizer_and_probe_parity(
    emb, spark, tmp_path
):
    """FAISS-add semantics: build the index on HALF the corpus, append
    the other half under the frozen quantizer. (1) Probes of the
    appended index equal the inline ivf_topk over the FULL corpus with
    those same frozen centroids; (2) existing index files are never
    rewritten (append = new files only, concurrent readers stay
    consistent); (3) appended assignments equal a reference
    re-assignment under the frozen centroids."""
    import glob
    import os

    from pyspark.sql import functions as F

    path = str(tmp_path / "ivf_index")
    base = emb.filter(F.col("vec_id") % 2 == 0)
    newb = emb.filter(F.col("vec_id") % 2 == 1)
    vectors.ivf_write_index(base, path, n_centroids=8, iters=1)
    before = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{path}/corpus/centroid_id=*/*.parquet")
    }
    rep = vectors.ivf_append_index(spark, newb, path)
    assert rep["appended"] == newb.count()
    assert 1 <= rep["centroids_touched"] <= 8
    # old files intact, byte-for-byte untouched
    for p, mt in before.items():
        assert os.path.exists(p) and os.path.getmtime(p) == mt, p
    # corpus now holds everything exactly once
    corpus = spark.read.parquet(f"{path}/corpus")
    assert corpus.count() == emb.count()
    assert corpus.select("vec_id").distinct().count() == emb.count()
    # appended assignments == reference assignment under frozen cents
    cents = spark.read.parquet(f"{path}/centroids")
    flat = vectors._quantized_flat(vectors.with_dvec(newb), "vec_id")
    norms = flat.groupBy("vec_id").agg(
        F.sum(F.col("q") * F.col("q")).alias("n2")
    )
    want_assign = {
        r.vec_id: r.centroid_id
        for r in vectors._ivf_assign(flat, norms, cents).collect()
    }
    got_assign = {
        r.vec_id: r.centroid_id
        for r in corpus.filter(F.col("vec_id") % 2 == 1)
        .select("vec_id", "centroid_id")
        .collect()
    }
    assert got_assign == want_assign
    # probe parity vs inline ivf_topk with the SAME frozen centroids
    got = vectors.ivf_probe_topk(spark, path, [0, 1, 2], k=10, nprobe=3)
    want = vectors.ivf_topk(
        emb, [0, 1, 2], k=10, nprobe=3, cents=cents
    )
    as_rows = lambda df: sorted(
        (r.query_id, r.neighbor_id, r.cosine, r.rank) for r in df.collect()
    )
    assert as_rows(got) == as_rows(want)
