"""The full LLM training-data preparation pipeline, composed end to
end from the engine's registered operators:

    raw documents
      → quality ∧ language gate + near-dup drop   (plans/curation.py)
      → ExactSubstr passage scrub (optional)      (operators/dedup.py)
      → benchmark decontamination                 (operators/corpus.py)
      → leakage-safe train/valid/test split       (operators/sampling.py)
      → sequence packing of the train split       (operators/corpus.py)

Each stage is individually oracle-checked through the driver registry
(`corpus_curation`, `passage_scrub`, `decontamination`,
`corpus_sampling`, `sequence_packing`); this plan pins their
composition: filters run before expensive stages, every join against a
small relation broadcasts, and nothing leaves the DataFrame plan until
the caller materializes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.corpus import contamination_stats, pack_sequences
from ..operators.sampling import with_split
from .curation import curate_corpus


def prepare_training_corpus(
    docs: DataFrame,
    benchmark: DataFrame,
    ctx_len: int = 2048,
    contamination_tau: float = 0.5,
    train_frac: float = 0.8,
    valid_frac: float = 0.1,
    scrub_k: int | None = None,
) -> dict[str, DataFrame]:
    """Returns the pipeline's two products:

    - ``documents``: surviving docs with their split assignment
      (curated, decontaminated, hash-bucket split);
    - ``train_packed``: the train split's sequence-packing assignment
      (doc → token_start / pack ids at ``ctx_len``).

    Stage order is the 100 TB-efficient one: the cheap projection gates
    shrink the corpus before the dedup shuffle; decontamination runs on
    curation survivors only (broadcast benchmark shingle set); the
    split is a pure projection; packing touches just the train split.
    """
    kept_ids = curate_corpus(docs).select("doc_id")
    kept = docs.join(kept_ids, "doc_id", "left_semi")
    if scrub_k is not None:
        # ExactSubstr scrub AFTER curation (survivors only pay the
        # shingle scan), BEFORE decontamination (scrubbed text is what
        # the benchmark overlap should see). Docs whose text changed
        # carry the scrubbed reconstruction forward.
        from ..operators.dedup import scrub_passages

        scrubbed = scrub_passages(kept, k=scrub_k).select(
            "doc_id", F.col("clean_text").alias("text")
        )
        kept = kept.drop("text").join(scrubbed, "doc_id")
    contaminated = (
        contamination_stats(kept, benchmark, min_overlap=contamination_tau)
        .filter(F.col("contaminated"))
        .select("doc_id")
    )
    # contaminated docs are rare by construction — broadcast anti-join
    clean = kept.join(F.broadcast(contaminated), "doc_id", "left_anti")
    tagged = with_split(
        clean, key="doc_id", train_frac=train_frac, valid_frac=valid_frac
    )
    train = tagged.filter(F.col("split") == "train")
    return {
        "documents": tagged,
        "train_packed": pack_sequences(train, ctx_len=ctx_len),
    }
