"""Record linkage: blocked fuzzy string matching.

The entity-resolution primitive (matching near-identical names across
catalogs) the reference's single-source world never needed, but any
multi-source ingest does. Same architecture as the dedup family
(`operators/dedup.py`): equality-blocked candidate generation so the
expensive pairwise measure runs on a bounded candidate set, never on
the |L|·|R| cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(df: DataFrame, id_col, name_col, id_out: str, name_out: str):
    return (
        df.select(
            F.col(id_col).alias(id_out), F.col(name_col).alias(name_out)
        )
        .filter(F.col(name_out).isNotNull())
        .select(
            id_out,
            name_out,
            F.explode(
                F.array_distinct(F.split(F.col(name_out), r"\s+"))
            ).alias("_tok"),
        )
        .filter(F.col("_tok") != "")
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_name: str,
    right_id: str,
    right_name: str,
    max_distance: int = 2,
    max_block_size: int | None = None,
) -> DataFrame:
    """Blocked fuzzy linkage of two name catalogs: every (left, right)
    pair whose names are within `max_distance` Levenshtein edits,
    restricted to candidates sharing ≥1 exact whitespace token —
    (left_id, left_name, right_id, right_name, distance).

    The blocking contract is part of the operator's semantics (like
    the LSH band contract in `dedup.minhash_lsh_dedup`): a pair whose
    every token was edited is not a candidate. For the canonical use —
    a dirty ingest matched against a master catalog, where typos hit
    one token of a multi-token name — token blocking captures the
    match; recall vs brute force is measured in tests.

    Plan: explode tokens on both sides → equi-join on the token →
    distinct candidate pair → ONE JVM `levenshtein` per candidate (no
    Python UDF anywhere). Cost is Σ_block |L_tok∩block|·|R_tok∩block|:
    linear in the dirty side when the catalog side's per-token counts
    are bounded (a vocabulary catalog). For open-vocabulary sides,
    pass `max_block_size`: tokens whose RIGHT-side block exceeds it
    (stop-word-sized blocks — 'the', 'inc', 'ltd' in a company
    catalog) are dropped from candidate generation by a broadcast
    anti-join BEFORE the blocking join, exactly the shingle df-cap
    idiom from `dedup.ngram_jaccard_dedup`. Multi-token names keep
    their discriminative tokens, so recall loss is confined to pairs
    whose ONLY shared token is a stop word — the trade documented on
    the dedup family.
    """
    lt = _tokens(left, left_id, left_name, "left_id", "left_name")
    rt = _tokens(right, right_id, right_name, "right_id", "right_name")
    if max_block_size is not None:
        hot = (
            rt.groupBy("_tok")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_block_size)
            .select("_tok")
        )
        lt = lt.join(F.broadcast(hot), "_tok", "left_anti")
        rt = rt.join(F.broadcast(hot), "_tok", "left_anti")
    cands = (
        lt.join(rt, "_tok")
        .select("left_id", "left_name", "right_id", "right_name")
        .distinct()
    )
    return cands.withColumn(
        "distance", F.levenshtein(F.col("left_name"), F.col("right_name"))
    ).filter(F.col("distance") <= max_distance)


def fuzzy_name_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_distance: int = 2,
) -> DataFrame:
    """Self-linkage: all id pairs (id_a < id_b) within `max_distance`
    edits under the same token-blocking contract as `fuzzy_join` —
    catalog self-dedup. Quadratic in per-name multiplicity by nature
    (every pair of records sharing a name IS a result row); run it on
    the DISTINCT name catalog, then propagate to records by joining
    back on the name, exactly like `dedup.canonical_selection`.
    """
    out = fuzzy_join(
        df, df, id_col, name_col, id_col, name_col, max_distance
    )
    return (
        out.filter(F.col("left_id") < F.col("right_id"))
        .select(
            F.col("left_id").alias("id_a"),
            F.col("right_id").alias("id_b"),
            F.col("left_name").alias("name_a"),
            F.col("right_name").alias("name_b"),
            "distance",
        )
    )
