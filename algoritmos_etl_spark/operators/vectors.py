"""Vector similarity search over embedding columns.

North-star extensions (SURVEY.md §7.2 M8) over the `embeddings` table
(`vec_id, embedding array<float>, label`). Generalizes the reference's
cosine-similarity operator (algorithms/similarity.py:359-433) from two
aligned series to a corpus of vectors.

Scale shapes:
- Brute-force top-k is the correctness baseline: broadcast the (small)
  query set against the corpus — one pass, no shuffle of the corpus.
- The scale path is LSH bucketing (random-hyperplane signs): candidates
  share a bucket, so the join fans out per bucket. Hyperplane
  components are derived from md5 bits — deterministic, no state to
  ship, reproducible on any engine.
- Dot products are JVM-side `zip_with`/`aggregate` folds — no Python
  in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

LSH_PLANES = 8


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def with_dvec(df: DataFrame, col: str = "embedding") -> DataFrame:
    """Cast float vectors to double once, up front (fold math in double)."""
    return df.withColumn("dvec", F.col(col).cast("array<double>"))


def cosine_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """Brute-force cosine top-k per query vector (excluding self).

    The query side is tiny → broadcast; the corpus streams through one
    projection + per-query window rank. This is the exact baseline an
    ANN variant is measured against.
    """
    base = with_dvec(embeddings)
    queries = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("dvec").alias("qvec")
    )
    pairs = base.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    cos = _dot(F.col("qvec"), F.col("dvec")) / (
        _norm(F.col("qvec")) * _norm(F.col("dvec"))
    )
    scored = pairs.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("cosine"), 6).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def cosine_neardup_pairs(embeddings: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (i < j, cosine ≥ τ).

    All-pairs form — correctness baseline and fine for bounded corpora;
    the LSH variant below is the 100 TB path.
    """
    base = with_dvec(embeddings).select("vec_id", "dvec")
    a = base.select(F.col("vec_id").alias("vec_a"), F.col("dvec").alias("va"))
    b = base.select(F.col("vec_id").alias("vec_b"), F.col("dvec").alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("vec_a") < F.col("vec_b"))
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        pairs.select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", F.round("cosine", 6).alias("cosine"))
    )


def _plane_component(p: Column | int, i: Column) -> Column:
    """Deterministic ±1 hyperplane component from an md5 bit."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit("plane"), p, i)), 1, 15), 16, 10
    ).cast("long")
    return F.when(h.bitwiseAND(F.lit(1)) == 1, F.lit(1.0)).otherwise(F.lit(-1.0))


def lsh_buckets(embeddings: DataFrame, n_planes: int = LSH_PLANES) -> DataFrame:
    """Random-hyperplane LSH bucket per vector: bit p = sign(v·plane_p).

    All expression-level: for each plane, fold the vector against
    md5-derived ±1 components; pack sign bits into one integer bucket.
    """
    base = with_dvec(embeddings)
    bits = []
    for p in range(n_planes):
        dot_p = F.aggregate(
            F.zip_with(
                F.col("dvec"),
                F.transform(
                    F.sequence(F.lit(0), F.size("dvec") - 1),
                    lambda i: _plane_component(F.lit(str(p)), i),
                ),
                lambda x, c: x * c,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot_p >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return base.withColumn("bucket", bucket.cast("int"))


def lsh_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = 10,
    n_planes: int = LSH_PLANES
) -> DataFrame:
    """ANN top-k: rank only candidates in the query's LSH bucket.

    Trades recall for a candidate set ~corpus/2^planes per query —
    the standard IVF/LSH shape for embedding search at scale. Recall
    vs `cosine_topk` is pinned by tests.
    """
    bucketed = lsh_buckets(embeddings, n_planes)
    queries = bucketed.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("dvec").alias("qvec"),
        F.col("bucket").alias("qbucket"),
    )
    cands = bucketed.join(
        F.broadcast(queries),
        (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    cos = _dot(F.col("qvec"), F.col("dvec")) / (
        _norm(F.col("qvec")) * _norm(F.col("dvec"))
    )
    scored = cands.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("cosine"), 6).alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def embedding_norms(embeddings: DataFrame) -> DataFrame:
    """Per-vector L2 norm + dimension — sanity/profiling op."""
    base = with_dvec(embeddings)
    return base.select(
        "vec_id",
        F.size("dvec").alias("dim"),
        F.round(_norm(F.col("dvec")), 6).alias("l2_norm"),
    )
