"""Text analysis for training-data pipelines: tokenization, quality
stats, language ID, fingerprinting.

These extend the reference surface (north-star extensions, SURVEY.md
§7.2 M8) over the `documents` table. Everything here is pure JVM-side
expression work — the operations a 100 TB text-dedup pipeline runs per
document must not drop into Python.

Dialect-parity notes (each op has a DuckDB oracle twin in
driver_queries_ext): tokenization is literal single-space split (no
regex dialect risk); language ID counts marker-substring occurrences
via the replace-length trick (identical semantics in any SQL engine);
hashes are md5-prefix integers (bit-identical everywhere).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# language → marker words (padded-substring counting). The heuristic is
# an n-gram/marker-frequency language detector — deliberately simple
# and fully SQL-expressible so the oracle can replicate it.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "is"),
    "es": ("el", "la", "que"),
    "de": ("der", "die", "und"),
    "fr": ("le", "les", "et"),
}


def words_col(text: Column) -> Column:
    """Whitespace tokens, empties removed (literal-space split)."""
    return F.filter(F.split(F.trim(text), " "), lambda x: x != "")


def normalized_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapsed spaces."""
    return F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))


def token_hash(*parts: Column | str) -> Column:
    """Deterministic 60-bit integer hash (md5-prefix) — engine-portable."""
    cols = [F.lit(p) if isinstance(p, str) else p for p in parts]
    return F.conv(F.substring(F.md5(F.concat_ws(":", *cols)), 1, 15), 16, 10).cast(
        "long"
    )


def text_stats(docs: DataFrame) -> DataFrame:
    """Quality scoring: length, word counts, word-length moments,
    stopword ratio. One projection pass, no shuffle."""
    words = words_col(F.col("text"))
    n_words = F.size(words)
    stop_hits = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    total_word_chars = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    return docs.select(
        "doc_id",
        F.length("text").alias("len_chars"),
        n_words.alias("n_words"),
        F.round(
            F.when(n_words > 0, total_word_chars.cast("double") / n_words).otherwise(
                0.0
            ),
            6,
        ).alias("avg_word_len"),
        F.round(
            F.when(n_words > 0, stop_hits.cast("double") / n_words).otherwise(0.0), 6
        ).alias("stopword_ratio"),
        F.size(F.array_distinct(words)).alias("n_distinct_words"),
    )


def _marker_count(text: Column, marker: str) -> Column:
    """Occurrences of ` marker ` in the padded text via replace-length.

    `replace` removes non-overlapping occurrences left-to-right — the
    same algorithm in every SQL engine, so the oracle twin is exact.
    Note ' x x x ' counts 1 for marker 'x x' in both engines (shared
    separator) — acceptable for a frequency heuristic.
    """
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    needle = f" {marker} "
    removed = F.replace(padded, F.lit(needle), F.lit(""))
    return ((F.length(padded) - F.length(removed)) / len(needle)).cast("long")


def lang_scores(docs: DataFrame) -> DataFrame:
    """Marker-frequency score per candidate language."""
    text = F.lower(F.col("text"))
    cols = [
        sum(
            (_marker_count(text, m) for m in markers),
            F.lit(0).cast("long"),
        ).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    ]
    return docs.select("doc_id", *cols)


def lang_id(docs: DataFrame) -> DataFrame:
    """Predicted language: argmax marker score, fixed-order tie-break
    (en > es > de > fr), 'und' when all scores are zero."""
    s = lang_scores(docs)
    en, es, de, fr = (F.col(f"score_{lang}") for lang in ("en", "es", "de", "fr"))
    pred = (
        F.when((en == 0) & (es == 0) & (de == 0) & (fr == 0), F.lit("und"))
        .when((en >= es) & (en >= de) & (en >= fr), F.lit("en"))
        .when((es >= de) & (es >= fr), F.lit("es"))
        .when(de >= fr, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return s.select("doc_id", pred.alias("pred_lang"))


# Regex pre-tokenizer classes (GPT-2-style category split, simplified
# to explicit character classes so the Java and RE2 regex dialects
# agree byte-for-byte): alpha runs, digit runs, symbol runs.
TOKEN_ALPHA = "[A-Za-z]+"
TOKEN_DIGIT = "[0-9]+"
TOKEN_OTHER = "[^A-Za-z0-9 ]+"
SUBWORD_CHARS = 4  # BPE-ish budget: one subword token per ~4 chars


def token_counts(docs: DataFrame) -> DataFrame:
    """Token counting: whitespace tokens plus a BPE-ish regex estimate.

    The regex pass counts pre-tokenizer category runs (alpha / digit /
    other); the subword estimate charges each alpha run ceil(len/4)
    tokens (digit/symbol runs count 1 each) — the standard quick proxy
    for budgeting an LLM training corpus without shipping a tokenizer
    model. One projection pass, no shuffle, JVM-side regex only.
    """
    alpha = F.regexp_extract_all(F.col("text"), F.lit(TOKEN_ALPHA), F.lit(0))
    subword = F.aggregate(
        alpha,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.ceil(F.length(t) / F.lit(SUBWORD_CHARS)),
    )
    n_digit = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(TOKEN_DIGIT), F.lit(0))
    ).cast("long")
    n_other = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(TOKEN_OTHER), F.lit(0))
    ).cast("long")
    return docs.select(
        "doc_id",
        F.size(words_col(F.col("text"))).cast("long").alias("n_ws_tokens"),
        F.size(alpha).cast("long").alias("n_alpha_tokens"),
        n_digit.alias("n_digit_tokens"),
        n_other.alias("n_symbol_tokens"),
        (subword + n_digit + n_other).alias("n_tokens_est"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Document fingerprints: exact (md5 of normalized text) and
    order-insensitive content hash (xor of distinct-token hashes —
    a set-hash usable for shingle-free near-dup blocking)."""
    norm = normalized_text(F.col("text"))
    words = F.array_distinct(words_col(norm))
    tok_hashes = F.transform(
        words,
        lambda w: F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("long"),
    )
    set_hash = F.aggregate(
        tok_hashes, F.lit(0).cast("long"), lambda acc, h: acc.bitwiseXOR(h)
    )
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        set_hash.alias("token_set_hash"),
    )
