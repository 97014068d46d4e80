"""BM25 retrieval, RAG chunking, bigram LM — semantics and plan shape."""

import pytest
from pyspark.sql import functions as F

from algoritmos_etl_spark.operators import corpus, retrieval


@pytest.fixture(scope="module")
def tiny_docs(spark):
    return spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "the dog sat"),
            (2, "cat cat cat cat"),
            (3, "completely unrelated words here"),
            (4, "   "),  # whitespace only -> no terms
        ],
        "doc_id long, text string",
    )


def test_bm25_ranks_term_bearing_docs(spark, tiny_docs):
    q = spark.createDataFrame(
        [(0, "cat"), (1, "sat mat")], "query_id int, query_text string"
    )
    out = retrieval.bm25_topk(tiny_docs, q, top_k=10).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    # only docs containing >=1 query term appear
    assert {r.doc_id for r in by_q[0]} == {0, 2}
    assert {r.doc_id for r in by_q[1]} == {0, 1}
    # saturating tf: doc 2 (cat x4) outranks doc 0 (cat x1)
    assert by_q[0][0].doc_id == 2 and by_q[0][0].rank == 1
    # doc 0 matches both 'sat' and 'mat'; doc 1 only 'sat'
    assert by_q[1][0].doc_id == 0
    # scores strictly ordered within a query, ranks contiguous from 1
    for rows in by_q.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        assert all(
            a.score >= b.score for a, b in zip(rows, rows[1:])
        )


def test_bm25_broadcasts_query_side(spark, tiny_docs):
    q = spark.createDataFrame([(0, "cat")], "query_id int, query_text string")
    plan = retrieval.bm25_topk(tiny_docs, q)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_chunking_cover_and_overlap(spark, tiny_docs):
    # chunk_size 4, overlap 2 -> stride 2
    out = retrieval.chunk_documents(tiny_docs, chunk_size=4, overlap=2)
    rows = {(r.doc_id, r.chunk_id): r for r in out.collect()}
    # doc 0: 6 words -> ceil((6-2)/2)=2 chunks: [0:4], [2:6]
    assert rows[(0, 0)].chunk_text == "the cat sat on"
    assert rows[(0, 1)].chunk_text == "sat on the mat"
    # doc 1: 3 words (< chunk_size) -> exactly one short chunk
    assert rows[(1, 0)].chunk_text == "the dog sat"
    assert rows[(1, 0)].n_words == 3
    assert (1, 1) not in rows
    # whitespace-only doc emits nothing
    assert not any(d == 4 for d, _ in rows)
    # reconstruction: consecutive chunks agree on the overlap
    assert rows[(0, 0)].chunk_text.split()[-2:] == rows[(0, 1)].chunk_text.split()[:2]


def test_chunking_is_shuffle_free(spark, tiny_docs):
    plan = (
        retrieval.chunk_documents(tiny_docs, chunk_size=4, overlap=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_chunking_rejects_bad_overlap(spark, tiny_docs):
    with pytest.raises(ValueError):
        retrieval.chunk_documents(tiny_docs, chunk_size=4, overlap=4)


def test_bigram_lm_exact_counts(spark):
    docs = spark.createDataFrame(
        [(0, "a b a b c"), (1, "a b"), (2, "x")],
        "doc_id long, text string",
    )
    out = {(r.w1, r.w2): r for r in corpus.bigram_lm_topk(docs, top_k=10).collect()}
    # pairs: doc0 -> (a,b),(b,a),(a,b),(b,c); doc1 -> (a,b); doc2 none
    assert out[("a", "b")].n_pair == 3
    assert out[("b", "a")].n_pair == 1
    assert out[("b", "c")].n_pair == 1
    # p(b|a): 3 of 3 'a'-prefixed bigrams; p(a|b) = 1 of 2
    assert out[("a", "b")].p_cond == 1.0
    assert out[("b", "a")].p_cond == 0.5
    # single-word doc contributes no bigrams
    assert not any(w1 == "x" for w1, _ in out)


def test_bigram_lm_topk_is_take_ordered(spark, tiny_docs):
    plan = (
        corpus.bigram_lm_topk(tiny_docs, top_k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
