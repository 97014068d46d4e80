"""End-to-end training-corpus curation: quality gate → language gate →
near-dup drop.

The composition a 100 TB text-pipeline user actually runs (quality
scoring, language ID, MinHash-LSH dedup are each registered operators;
this plan wires them in the standard order). Filtering FIRST shrinks
the corpus the dedup stage shingles/hashes — the expensive stage runs
on survivors only. The drop policy is greedy pair-drop (keep the lower
doc_id of every verified near-dup pair); `dedup.neardup_clusters`
provides the transitive keep-one-per-cluster variant when cluster
resolution is worth an iterative job.

Every stage is a registered operator with its own oracle; the composed
plan has one too (`corpus_curation` in driver_queries_ext).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import dedup, text

MIN_WORDS = 20
MIN_STOPWORD_RATIO = 0.02
MAX_STOPWORD_RATIO = 0.25
KEEP_LANG = "en"


def curate_corpus(
    docs: DataFrame,
    min_words: int = MIN_WORDS,
    min_stopword_ratio: float = MIN_STOPWORD_RATIO,
    max_stopword_ratio: float = MAX_STOPWORD_RATIO,
    keep_lang: str = KEEP_LANG,
    neardup_threshold: float = 0.2,
    max_bucket_size: int | None = 100,
    max_dup_3gram_frac: float | None = None,
    shingles: DataFrame | None = None,
    lang_pred: DataFrame | None = None,
) -> DataFrame:
    """Surviving documents with their quality features.

    quality gate (word count + stopword-ratio band) ∧ language gate
    (marker-frequency ID) ∧ optional repetition gate (Gopher-style
    duplicate-trigram fraction, `max_dup_3gram_frac`), then MinHash-LSH
    near-dup pairs among the survivors; the higher doc_id of each
    verified pair is dropped via a left-anti join. Stats/lang are
    projection-only; the repetition gate adds one n-gram count shuffle
    over pre-dedup survivors — still upstream of the expensive stage.

    `lang_pred` optionally replaces the row-local marker heuristic as
    the language signal with a PRECOMPUTED (doc_id, pred_lang) table —
    `text.lang_id_trained`'s output (see `curate_corpus_trained_lang`).
    A trained gate is inherently two-pass (the model must see the
    corpus before it can gate it), so this arm pays one corpus-sized
    doc_id join the row-local heuristic avoids; everything downstream
    is unchanged.

    `shingles` optionally supplies the corpus's materialized (doc_id,
    shingle) relation (the standing `ngram_write_index` table at
    cluster scale, the session shingle cache here): the dedup stage
    then SEMI-JOINS it down to gate survivors instead of re-tokenizing
    and re-hashing the surviving text — the survivor set is most of
    the corpus, so skipping the second shingle pass matters at scale.
    """
    # stats and language are both per-row projections of the same docs
    # — one fused select, not a doc_id join of two projections (a join
    # here would shuffle the whole corpus twice for nothing)
    stats = text.text_quality_gate(docs)
    if lang_pred is not None:
        stats = stats.drop("pred_lang").join(
            lang_pred.select("doc_id", "pred_lang"), "doc_id"
        )
    quality = stats.filter(
        (F.col("pred_lang") == keep_lang)
        & (F.col("n_words") >= min_words)
        & (F.col("stopword_ratio") >= min_stopword_ratio)
        & (F.col("stopword_ratio") <= max_stopword_ratio)
    )
    if max_dup_3gram_frac is not None:
        rep = text.repetition_stats(docs).filter(
            F.col("dup_3gram_frac") <= max_dup_3gram_frac
        )
        quality = quality.join(rep.select("doc_id"), "doc_id")
    # the survivor set feeds three plan branches (docs join, shingle
    # semi-join, final anti-join) and Catalyst does not CSE across
    # branches — without the checkpoint the regex-heavy gate projection
    # runs once per consumer (measured ~30% of the query at sf0.1)
    quality = quality.localCheckpoint(eager=False)
    fdocs = docs.join(quality.select("doc_id"), "doc_id")
    # restrict a precomputed shingle table to survivors — dropping
    # non-survivor rows is REQUIRED, not just an optimization: stale
    # shingles would put dropped docs in buckets and their pairs could
    # anti-join out surviving partners
    fsh = (
        shingles.join(quality.select("doc_id"), "doc_id", "left_semi")
        if shingles is not None
        else None
    )
    pairs = dedup.minhash_lsh_dedup(
        fdocs, threshold=neardup_threshold, max_bucket_size=max_bucket_size,
        shingles=fsh,
    )
    drops = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return (
        quality.join(drops, "doc_id", "left_anti")
        .select("doc_id", "n_words", "stopword_ratio", "pred_lang")
    )


def curate_corpus_trained_lang(docs: DataFrame, **kwargs) -> DataFrame:
    """`curate_corpus` with the TRAINED language gate: the
    char-trigram NB prediction (`text.lang_id_trained` — distantly
    supervised by the marker heuristic, then generalizing past it)
    replaces the 4-marker floor as the gate's language signal. Docs
    the heuristic leaves 'und' but whose trigrams are plainly
    `keep_lang` now survive; marker-coincidence false positives in
    other languages now drop."""
    pred = text.lang_id_trained(docs).select("doc_id", "pred_lang")
    return curate_corpus(docs, lang_pred=pred, **kwargs)
