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
    every token array, as one JVM fold — no Python in the loop.
    Preserves every other column (training carries freq; encoding
    carries only the word)."""
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
    return cur.withColumn("toks", folded)


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
    return _learn_merge_loop(cur, n_merges, min_freq)


def _learn_merge_loop(
    cur: DataFrame, n_merges: int, min_freq: int
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """The merge-learning loop shared by the word grain (`learn_bpe`)
    and the byte grain (`learn_bpe_bytes`): `cur` is any
    (…, freq, toks) table; per round, pair-count partial agg →
    single-row argmax with the count-desc/left-asc/right-asc
    tiebreak → greedy JVM fold, lineage truncated per round."""
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
    broadcast join of the word->toks table (bounded vocabulary).

    COUNT-ONLY contract, and the inner join DROPS words absent from
    the training vocabulary — fine for corpus statistics over the
    training corpus itself, but it silently under-counts on unseen
    text. For ordered token IDs with full OOV coverage (the sequence
    the trainer actually consumes) use `bpe_encode`, which segments
    the words OF THE INPUT with the learned merges instead of looking
    them up."""
    return (
        docs.select(
            "doc_id", F.explode(words_col(F.lower(F.col("text")))).alias("word")
        )
        .join(F.broadcast(tokens_vocab.select("word", "toks")), "word")
        .select("doc_id", F.explode("toks").alias("token"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"))
    )


# --------------------------------------------------------------- encoding
#
# Vocabulary layout (fixed, deterministic):
#   ids 0..255      reserved byte tokens <0x00>..<0xFF> (the fallback)
#   ids 256..       the training alphabet (single chars + END), sorted
#   ids 256+|A|..   merged tokens, in learned-merge order
# Byte fallback is Sennrich 2016 §3's OOV story as modern tokenizers
# ship it (SentencePiece byte_fallback, GPT-2 byte-level BPE): a
# character outside the training alphabet decomposes into its UTF-8
# bytes, so EVERY string encodes losslessly — no <unk>.

N_BYTE_IDS = 256


def bpe_alphabet(docs: DataFrame) -> list[str]:
    """Sorted training alphabet: every distinct character of the
    lowercased corpus words, plus END. One explode + distinct — the
    result is bounded by the script's character set, the only
    driver-side datum."""
    chars = (
        docs.select(F.explode(words_col(F.lower(F.col("text")))).alias("w"))
        .select(F.explode(F.split(F.col("w"), "")).alias("c"))
        .filter(F.col("c") != "")
        .distinct()
        .collect()
    )
    return sorted({r.c for r in chars} | {END})


def bpe_vocab_ids(
    merges: list[tuple[str, str, int]], alphabet: list[str]
) -> dict[str, int]:
    """token -> id under the fixed layout above."""
    vocab: dict[str, int] = {}
    for i, ch in enumerate(sorted(alphabet)):
        vocab[ch] = N_BYTE_IDS + i
    base = N_BYTE_IDS + len(vocab)
    for i, (left, right, _c) in enumerate(merges):
        vocab.setdefault(left + right, base + i)
    return vocab


def segment_words(words: DataFrame, merges: list) -> DataFrame:
    """Apply the learned merges IN ORDER (each greedy left-to-right —
    the training fold reused verbatim) to any word table: (word) ->
    (word, toks). This is Sennrich's encode: unseen words still
    segment correctly because merges rewrite character sequences, not
    vocabulary lookups."""
    cur = words.select(
        "word",
        F.concat(
            F.filter(F.split(F.col("word"), ""), lambda c: c != ""),
            F.array(F.lit(END)),
        ).alias("toks"),
    ).localCheckpoint(eager=False)
    for left, right, _c in merges:
        cur = _apply_merge(cur, left, right).localCheckpoint(eager=False)
    return cur


def bpe_encode(
    docs: DataFrame,
    merges: list,
    alphabet: list[str],
) -> DataFrame:
    """Encode documents to ORDERED token-ID sequences under a learned
    tokenizer, with UTF-8 byte fallback for out-of-alphabet characters
    — the sequence grain a training pipeline feeds to packing.
    Output: (doc_id, n_tokens, token_ids array<int>); empty/NULL text
    gives an empty array, and every document round-trips losslessly.

    Scale shape: segmentation runs once per DISTINCT word of the
    input (the Heaps'-law bounded grain, same premise as training),
    not per occurrence; the token->id map is a LITERAL map expression
    (vocabulary-sized, no join); per-doc reassembly is one
    posexplode + join on word + collect_list sorted by position —
    the single shuffle, on doc_id. The byte fallback is pure JVM
    (hex + substring arithmetic), reached only for tokens outside
    the vocab literal."""
    vocab = bpe_vocab_ids(merges, alphabet)
    vmap = F.create_map(
        *[x for t, i in vocab.items() for x in (F.lit(t), F.lit(i))]
    )

    def byte_ids(tok):
        hx = F.hex(F.encode(tok, "UTF-8"))
        return F.transform(
            F.sequence(F.lit(1), (F.length(hx) / 2).cast("int")),
            lambda i: F.conv(hx.substr(i * 2 - 1, F.lit(2)), 16, 10).cast(
                "int"
            ),
        )

    def ids_for(tok):
        # try_: ANSI element_at throws on a missing map key; the miss
        # IS the signal that routes to the byte fallback
        mapped = F.try_element_at(vmap, tok)
        return F.when(
            mapped.isNotNull(), F.array(mapped.cast("int"))
        ).otherwise(byte_ids(tok))

    words_in_doc = docs.select(
        "doc_id",
        F.posexplode_outer(words_col(F.lower(F.col("text")))).alias(
            "pos", "word"
        ),
    )
    word_codes = segment_words(
        words_in_doc.filter(F.col("word").isNotNull())
        .select("word")
        .distinct(),
        merges,
    ).select(
        "word",
        F.flatten(F.transform(F.col("toks"), ids_for)).alias("ids"),
    )
    per_doc = (
        words_in_doc.join(word_codes, "word", "left")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("word").isNotNull(),
                                F.struct("pos", "ids"),
                            )
                        )
                    ),
                    lambda s: s["ids"],
                )
            ).alias("token_ids")
        )
    )
    return per_doc.select(
        "doc_id",
        F.size("token_ids").cast("long").alias("n_tokens"),
        "token_ids",
    )


def bpe_decode(
    encoded: DataFrame,
    merges: list,
    alphabet: list[str],
) -> DataFrame:
    """Inverse of `bpe_encode`: ORDERED token-id sequences back to
    text. Round-trip contract (pytest-pinned):
    decode(encode(text)) == the encoder's normalized view of text
    (lowercased, single-spaced words) for EVERY document, byte
    fallback included.

    Pure JVM, one projection, no shuffle: each id maps to the HEX of
    its UTF-8 bytes — vocab ids through a literal map (with the `</w>`
    end-of-word marker rewritten to a space), byte-fallback ids
    (< 256) to their own two hex digits arithmetically — and the
    concatenated hex stream is unhex'd and UTF-8-decoded ONCE per
    document, so a multi-byte character split across several fallback
    ids reassembles correctly (per-id decoding could never do this).
    Output: (doc_id, text).
    """
    import binascii

    vocab = bpe_vocab_ids(merges, alphabet)
    hexmap = F.create_map(
        *[
            x
            for t, i in vocab.items()
            for x in (
                F.lit(i),
                F.lit(
                    binascii.hexlify(
                        t.replace(END, " ").encode("utf-8")
                    ).decode("ascii")
                ),
            )
        ]
    )
    id_hex = lambda i: F.coalesce(  # noqa: E731
        F.try_element_at(hexmap, i),
        F.lpad(F.lower(F.conv(i.cast("string"), 10, 16)), 2, "0"),
    )
    hex_stream = F.concat_ws(
        "", F.transform(F.col("token_ids"), id_hex)
    )
    return encoded.select(
        "doc_id",
        F.rtrim(F.decode(F.unhex(hex_stream), "UTF-8")).alias("text"),
    )


# ------------------------------------------------ byte-level grain
#
# GPT-2-style byte-level BPE (Radford et al. 2019): pre-tokenize with
# a regex over the RAW text (case and whitespace significant — a
# leading space is part of the following pre-token), then merge over
# each pre-token's UTF-8 BYTE sequence. Every byte is in-vocabulary
# by construction, so the alphabet-collection step and the OOV
# fallback disappear, and decode(encode(text)) == text EXACTLY (the
# word grain only round-trips the normalized view).
#
# Byte tokens are represented as 2-char lowercase hex strings; a
# merged token is the concatenation of its parts' hex (always even
# length ≥ 4, so "is it a single byte" is just length = 2). This
# keeps the ENTIRE word-grain machinery reusable verbatim:
# `_pair_counts`, `_apply_merge`, and `_learn_merge_loop` operate on
# (freq, toks) and never look inside a token.
#
# Pre-tokenizer pattern note: GPT-2's original has a trailing
# `\s+(?!\S)` lookahead arm; RE2 (the DuckDB oracle's engine) has no
# lookahead, so this GPT-2-STYLE pattern drops that arm — the only
# divergence is that a MULTI-space run becomes one whitespace
# pre-token instead of splitting before its last space. Both engine
# twins share the pattern; leftmost-first alternation semantics agree
# between java.util.regex and RE2 (pytest-pinned on hostile mixed
# fixtures).

PRETOKEN_RE = (
    "'s|'t|'re|'ve|'m|'ll|'d"
    "| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"
)

N_RESERVED_BYTE_IDS = 256  # ids 0..255 = the bytes; merges from 256


def pretokens_col(text: Column) -> Column:
    """All pre-tokens of `text`, document order, as array<string> —
    one JVM regex pass."""
    return F.regexp_extract_all(text, F.lit(PRETOKEN_RE), F.lit(0))


def hex_chunks_col(tok: Column) -> Column:
    """UTF-8 bytes of `tok` as an array of 2-char lowercase hex
    strings — the byte grain's initial token sequence. Pure JVM (hex
    + substring arithmetic)."""
    hx = F.lower(F.hex(F.encode(tok, "UTF-8")))
    return F.transform(
        F.sequence(F.lit(1), (F.length(hx) / 2).cast("int")),
        lambda i: hx.substr(i * 2 - 1, F.lit(2)),
    )


def pretoken_freqs(docs: DataFrame) -> DataFrame:
    """(word, freq) at the pre-token grain (column kept as `word` so
    the shared merge machinery applies unchanged): one explode + one
    map-side-combinable groupBy — 100 TB of text reduces to the
    bounded weighted pre-token table, same premise as `word_freqs`."""
    return (
        docs.select(F.explode(pretokens_col(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def learn_bpe_bytes(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int = 20,
    min_freq: int = 2,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn up to `n_merges` byte-level merge rules. Returns
    (merges, tokenized_pretoken_table) — merges over hex-chunk
    tokens, deterministic at any parallelism (the shared loop's
    tiebreak on ascii hex strings orders identically on any
    engine)."""
    cur = pretoken_freqs(docs).select(
        "word", "freq", hex_chunks_col(F.col("word")).alias("toks")
    ).localCheckpoint(eager=False)
    return _learn_merge_loop(cur, n_merges, min_freq)


def bpe_bytes_vocab_ids(merges: list) -> dict[str, int]:
    """hex-token -> id: merged tokens only (single bytes are their
    own value — id = int(tok, 16), computed arithmetically, never
    through this map). First-wins on duplicate merged strings, the
    `bpe_vocab_ids` convention."""
    vocab: dict[str, int] = {}
    for i, (left, right, _c) in enumerate(merges):
        vocab.setdefault(left + right, N_RESERVED_BYTE_IDS + i)
    return vocab


def segment_pretokens(pretokens: DataFrame, merges: list) -> DataFrame:
    """(word) -> (word, toks) at the byte grain: hex-chunk the
    pre-token, then apply the learned merges in order (the shared
    greedy fold)."""
    cur = pretokens.select(
        "word", hex_chunks_col(F.col("word")).alias("toks")
    ).localCheckpoint(eager=False)
    for left, right, _c in merges:
        cur = _apply_merge(cur, left, right).localCheckpoint(eager=False)
    return cur


def bpe_encode_bytes(docs: DataFrame, merges: list) -> DataFrame:
    """Encode documents to ORDERED byte-level token-ID sequences:
    (doc_id, n_tokens, token_ids array<int>). Empty/NULL text gives
    an empty array; every string encodes losslessly and
    `bpe_decode_bytes` inverts EXACTLY (no normalization).

    Scale shape mirrors `bpe_encode`: segmentation runs once per
    DISTINCT pre-token (Heaps-bounded), the merged-token -> id map is
    a literal expression (single bytes resolve arithmetically from
    their own hex), per-doc reassembly is one posexplode + join +
    sorted collect — the single shuffle, on doc_id."""
    vocab = bpe_bytes_vocab_ids(merges)
    vmap = F.create_map(
        *[x for t, i in vocab.items() for x in (F.lit(t), F.lit(i))]
    ) if vocab else None

    def ids_for(tok):
        byte_id = F.conv(tok, 16, 10).cast("int")
        if vmap is None:
            return byte_id
        return F.coalesce(F.try_element_at(vmap, tok).cast("int"), byte_id)

    pt_in_doc = docs.select(
        "doc_id",
        F.posexplode_outer(pretokens_col(F.col("text"))).alias(
            "pos", "word"
        ),
    )
    pt_codes = segment_pretokens(
        pt_in_doc.filter(F.col("word").isNotNull())
        .select("word")
        .distinct(),
        merges,
    ).select(
        "word", F.transform(F.col("toks"), ids_for).alias("ids")
    )
    per_doc = (
        pt_in_doc.join(pt_codes, "word", "left")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("word").isNotNull(),
                                F.struct("pos", "ids"),
                            )
                        )
                    ),
                    lambda s: s["ids"],
                )
            ).alias("token_ids")
        )
    )
    return per_doc.select(
        "doc_id",
        F.size("token_ids").cast("long").alias("n_tokens"),
        "token_ids",
    )


def bpe_decode_bytes(encoded: DataFrame, merges: list) -> DataFrame:
    """EXACT inverse of `bpe_encode_bytes` (no END marker, no case or
    whitespace normalization — byte level is lossless by
    construction): each merged id maps back to its hex through a
    literal map, byte ids to their own two hex digits arithmetically,
    and the per-doc hex stream is unhex'd and UTF-8-decoded once, so
    multi-byte characters split across merges reassemble. Pure JVM,
    one projection, no shuffle."""
    vocab = bpe_bytes_vocab_ids(merges)
    hexmap = F.create_map(
        *[x for t, i in vocab.items() for x in (F.lit(i), F.lit(t))]
    ) if vocab else None
    byte_hex = lambda i: F.lpad(  # noqa: E731
        F.lower(F.conv(i.cast("string"), 10, 16)), 2, "0"
    )
    id_hex = (
        byte_hex
        if hexmap is None
        else (
            lambda i: F.coalesce(F.try_element_at(hexmap, i), byte_hex(i))
        )
    )
    hex_stream = F.concat_ws("", F.transform(F.col("token_ids"), id_hex))
    return encoded.select(
        "doc_id",
        F.decode(F.unhex(hex_stream), "UTF-8").alias("text"),
    )
