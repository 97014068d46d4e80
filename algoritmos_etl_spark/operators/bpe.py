"""Distributed BPE tokenizer training (Sennrich et al. 2016).

The classic subword-vocabulary learner, expressed at the grain that
scales: BPE statistics depend only on the WORD-FREQUENCY table, not
the corpus — so one corpus pass reduces 100 TB of text to a bounded
(Heaps'-law) weighted vocabulary, and every merge round after that is
a pair-count aggregation over that table. Per round:

  1. explode each word's adjacent token pairs weighted by word freq
     (`zip_with` over shifted slices — the linear form, no per-position
     element_at walk),
  2. partial-agg the pair counts, take the global top-1
     (TakeOrderedAndProject; the ONLY driver-side datum per round is
     that single winning pair),
  3. apply the merge to every word's token array as a pure-JVM
     `F.aggregate` left fold (greedy left-to-right, matching the
     reference algorithm's scan order), and lazily localCheckpoint to
     truncate the lineage so round N's plan doesn't nest N folds.

Nothing unbounded ever reaches the driver: rounds collect one row
each. This is the iterative-algorithm pattern (driver loop over a
bounded round count, distributed aggregation inside) that the
engine's CC/k-means operators also use; genuinely non-SQL-expressible,
so correctness is pinned against a pure-Python reference
implementation in tests instead of a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import words_col

END = "</w>"  # word-boundary marker: merges never cross words


def word_freqs(docs: DataFrame) -> DataFrame:
    """(word, freq): one explode + one map-side-combinable groupBy."""
    return (
        docs.select(F.explode(words_col(F.lower(F.col("text")))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_tokens(wf: DataFrame) -> DataFrame:
    # word -> its character sequence plus the end-of-word marker
    toks = F.concat(
        F.split(F.col("word"), ""), F.array(F.lit(END))
    )
    return wf.select("word", "freq", toks.alias("toks"))


def _pair_counts(cur: DataFrame) -> DataFrame:
    n = F.size("toks")
    pairs = F.zip_with(
        F.slice(F.col("toks"), 1, n - 1),
        F.slice(F.col("toks"), 2, n - 1),
        lambda l, r: F.struct(l.alias("left"), r.alias("right")),
    )
    return (
        cur.filter(n >= 2)
        .select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("freq").alias("count"))
    )


def _apply_merge(cur: DataFrame, left: str, right: str) -> DataFrame:
    """Greedy left-to-right merge of (left, right) -> left+right inside
    every token array, as one JVM fold — no Python in the loop."""
    merged = left + right
    folded = F.aggregate(
        F.col("toks"),
        F.array().cast("array<string>"),
        # try_element_at: NULL (not an ANSI error) on the empty
        # accumulator of the first step -> condition falls through
        lambda acc, x: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return cur.select("word", "freq", folded.alias("toks"))


def learn_bpe(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int = 20,
    min_freq: int = 2,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn up to `n_merges` BPE merge rules from `docs`.

    Returns (merges, tokenized_vocab): merges as
    [(left, right, pair_count), ...] in learned order (ties broken by
    pair lexicographic order so the result is deterministic at any
    parallelism), and the final (word, freq, toks) table.
    """
    cur = _initial_tokens(word_freqs(docs)).localCheckpoint(eager=False)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(cur)
            .orderBy(
                F.col("count").desc(), F.col("left").asc(), F.col("right").asc()
            )
            .limit(1)
            .collect()
        )
        if not top or top[0]["count"] < min_freq:
            break
        left, right, count = top[0]["left"], top[0]["right"], top[0]["count"]
        merges.append((left, right, count))
        cur = _apply_merge(cur, left, right).localCheckpoint(eager=False)
    return merges, cur


def bpe_segment(tokens_vocab: DataFrame, docs: DataFrame) -> DataFrame:
    """Tokenize docs with a learned vocab: per-doc subword counts via a
    broadcast join of the word->toks table (bounded vocabulary)."""
    return (
        docs.select(
            "doc_id", F.explode(words_col(F.lower(F.col("text")))).alias("word")
        )
        .join(F.broadcast(tokens_vocab.select("word", "toks")), "word")
        .select("doc_id", F.explode("toks").alias("token"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"))
    )
