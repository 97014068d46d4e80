"""Graph analytics: integer-exact weighted PageRank + TextRank.

Extends the engine's iterative-algorithm family (pointer-jumping
connected components in `dedup.neardup_clusters`, Lloyd k-means in
`vectors`, BPE rounds in `bpe`) with the canonical fixed-point graph
ranking. Everything is joins + partial aggregations on the edge
table — node state never reaches the driver, and each iteration's
lineage is truncated with a lazy localCheckpoint (the BPE pattern),
so 10 iterations cost 10 bounded shuffles, not an exponentially
deepening plan.

Determinism contract (same idiom as the integer-exact Lloyd step):
ranks are int64 fixed-point (SCALE = 1e12). All per-iteration math is
integer — contributions use the overflow-safe decomposition
``floor(r·w/wu) = (r div wu)·w + ((r mod wu)·w) div wu`` (products
stay ≤ max(r, wu·w) << 2^63 instead of r·w), damping is
``15·SCALE/100 + 85·Σ/100`` in integer ops — so the result is
bit-identical on any engine and any partitioning, and the DuckDB
oracle reproduces the whole fixed-point loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12
_DAMP_NUM = 85  # damping 0.85 as integer percent
_BASE = (15 * SCALE) // 100


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    src: str = "u",
    dst: str = "v",
    weight: str = "w",
) -> DataFrame:
    """Weighted PageRank over a directed edge list — returns
    (node, rank_e12) with rank in 1e12 fixed-point (initial rank
    1.0·SCALE per node, per the unnormalized TextRank convention).

    Per iteration: one broadcast-free join of ranks onto edges
    (shuffle on the node key), one partial-agg sum of contributions,
    one left join back to the node set (nodes without in-edges keep
    the base rank). Nodes with no OUT-edges contribute nothing
    (their mass is not redistributed — the simple dangling-node
    convention, mirrored exactly in the oracle).
    """
    # Positivity guard at edge prep: a zero/negative summed weight
    # would make wu 0 → DIVIDE_BY_ZERO mid-iteration under ANSI mode
    # (or silently corrupt ranks otherwise). Degenerate edges are
    # dropped here so bad weights fail soft at BUILD time — the
    # documented semantics: only positive-weight edges carry rank.
    ew = (
        edges.groupBy(F.col(src).alias("u"), F.col(dst).alias("v"))
        .agg(F.sum(weight).alias("w"))
        .filter(F.col("w") > 0)
    )
    outw = ew.groupBy("u").agg(F.sum("w").alias("wu"))
    e = ew.join(outw, "u").localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    ranks = nodes.withColumn("r", F.lit(SCALE).cast("long"))
    contrib = F.expr("(r DIV wu) * w + ((r % wu) * w) DIV wu")
    for it in range(iterations):
        inflow = (
            e.join(ranks, e["u"] == ranks["node"])
            .select(F.col("v").alias("node"), contrib.alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        ranks = nodes.join(inflow, "node", "left").select(
            "node",
            (
                F.lit(_BASE)
                + F.expr(f"({_DAMP_NUM} * coalesce(c, 0L)) DIV 100")
            ).cast("long").alias("r"),
        )
        # truncate lineage every 3rd round (and at the end): enough
        # to keep the plan shallow, while 3x fewer checkpoint
        # materialization jobs than per-iteration truncation (r12;
        # integer math makes the cadence result-invariant)
        if it % 3 == 2 or it == iterations - 1:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", F.col("r").alias("rank_e12"))


def textrank_keywords(docs: DataFrame, top_k: int = 25) -> DataFrame:
    """TextRank keyword ranking (Mihalcea & Tarau 2004): PageRank over
    the corpus's word co-occurrence graph — nodes are vocabulary
    words, an undirected edge weighted by adjacent-bigram count links
    words that appear next to each other (self-loops dropped).
    Returns the top-k words by rank: (word, rank_e12, n_edges).

    Reuses the engine's bigram machinery (`corpus._doc_bigrams`: the
    zip_with shifted-slice build) for the edge list; the graph size is
    the VOCABULARY, not the corpus — 100 TB of text feeds one bigram
    partial-agg shuffle, and the fixed-point loop runs on the bounded
    vocabulary graph. Top-k plans as TakeOrderedAndProject with the
    word as tiebreak.
    """
    from .corpus import _doc_bigrams

    # materialize the bounded bigram-count table once per run (guide
    # §7.2): `undirected` references it twice and `degrees` twice
    # more, and Catalyst does not CSE across union/join branches — the
    # corpus-wide bigram explode+agg ran FOUR times per invocation
    # (r13; steady-state medians 2.8 → 2.4 s at sf0.1 — the remaining
    # cost is the 10-iteration loop's ~30 sequential exchanges). The
    # table is vocabulary-bigram grain, bounded, so it stays small.
    pairs = (
        _doc_bigrams(docs)
        .filter(F.col("w1") != F.col("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    undirected = pairs.select(
        F.col("w1").alias("u"), F.col("w2").alias("v"), F.col("n").alias("w")
    ).unionByName(
        pairs.select(
            F.col("w2").alias("u"),
            F.col("w1").alias("v"),
            F.col("n").alias("w"),
        )
    )
    ranks = pagerank(undirected, iterations=10)
    degrees = (
        undirected.groupBy(F.col("u").alias("node"))
        .agg(F.count_distinct("v").alias("n_edges"))
    )
    return (
        ranks.join(degrees, "node")
        .select(F.col("node").alias("word"), "rank_e12", "n_edges")
        .orderBy(F.col("rank_e12").desc(), F.col("word").asc())
        .limit(top_k)
    )
