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
        # analytic recall for tau=0.4: p = 1 - acos(0.4)/pi ~ 0.62,
        # 1-(1-p^4)^4 ~ 0.49; assert a loose floor
        recall = len(lsh) / len(exact)
        p = 1 - math.acos(0.4) / math.pi
        floor = (1 - (1 - p**4) ** 4) * 0.5
        assert recall >= floor, f"recall {recall} below floor {floor}"


def test_multi_table_buckets_shape(emb):
    b = vectors.lsh_table_buckets(emb, n_tables=4, planes_per_table=4)
    n = emb.count()
    assert b.count() == 4 * n
    rng = b.agg(
        F.min("sig").alias("lo"), F.max("sig").alias("hi"),
        F.count_distinct("tbl").alias("t"),
    ).first()
    assert rng.t == 4 and 0 <= rng.lo and rng.hi <= 15
