"""BPE learner pinned against a pure-Python reference implementation."""

from __future__ import annotations

from algoritmos_etl_spark.operators import bpe


def _ref_bpe(word_freqs: dict[str, int], n_merges: int, min_freq: int):
    """Reference Sennrich-style BPE on a word-frequency table with the
    operator's exact tie-breaks (count desc, pair lexicographic) and
    greedy left-to-right merge application."""
    vocab = {w: list(w) + [bpe.END] for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, f in word_freqs.items():
            t = vocab[w]
            for a, b in zip(t, t[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (left, right), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_freq:
            break
        merges.append((left, right, c))
        for w, t in vocab.items():
            out: list[str] = []
            for x in t:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            vocab[w] = out
    return merges, vocab


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_learn_bpe_matches_reference(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "low new lower newer",
        "wider wide widest wider",
    ]
    docs = _docs(spark, texts)
    merges, vocab_df = bpe.learn_bpe(spark, docs, n_merges=12, min_freq=2)

    wf = {
        r["word"]: r["freq"] for r in bpe.word_freqs(docs).collect()
    }
    ref_merges, ref_vocab = _ref_bpe(wf, n_merges=12, min_freq=2)
    assert merges == ref_merges
    got_vocab = {r["word"]: r["toks"] for r in vocab_df.collect()}
    assert got_vocab == ref_vocab


def test_learn_bpe_on_real_docs(spark):
    from algoritmos_etl_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    merges, vocab_df = bpe.learn_bpe(spark, docs, n_merges=6, min_freq=2)
    wf = {r["word"]: r["freq"] for r in bpe.word_freqs(docs).collect()}
    ref_merges, _ = _ref_bpe(wf, n_merges=6, min_freq=2)
    assert merges == ref_merges
    assert 0 < len(merges) <= 6

    # segmentation: every doc's subword count >= its word count
    seg = {r["doc_id"]: r["n_tokens"] for r in bpe.bpe_segment(vocab_df, docs).collect()}
    assert len(seg) > 0 and all(n > 0 for n in seg.values())


def test_min_freq_stops_learning(spark):
    docs = _docs(spark, ["a b c", "d e f"])  # no pair repeats twice
    merges, _ = bpe.learn_bpe(spark, docs, n_merges=5, min_freq=2)
    assert merges == []


def _ref_encode(texts_by_id, merges, alphabet):
    """Pure-Python twin of bpe_encode: per-word greedy merge
    application in learned order, fixed vocab layout, UTF-8 byte
    fallback for out-of-alphabet characters."""
    vocab = bpe.bpe_vocab_ids(merges, alphabet)
    out = {}
    for doc_id, text in texts_by_id.items():
        ids = []
        words = [w for w in (text or "").lower().strip().split(" ") if w]
        for w in words:
            toks = list(w) + [bpe.END]
            for left, right, _c in merges:
                nxt = []
                for x in toks:
                    if nxt and nxt[-1] == left and x == right:
                        nxt[-1] = left + right
                    else:
                        nxt.append(x)
                toks = nxt
            for t in toks:
                if t in vocab:
                    ids.append(vocab[t])
                else:
                    ids.extend(t.encode("utf-8"))
        out[doc_id] = ids
    return out


def test_bpe_encode_matches_python_reference_and_roundtrips(spark):
    train = _docs(spark, [
        "low lower lowest low low",
        "new newer newest new newer",
        "low new lower newer",
    ])
    merges, _ = bpe.learn_bpe(spark, train, n_merges=10, min_freq=2)
    alphabet = bpe.bpe_alphabet(train)
    assert merges  # the corpus must actually produce merges

    # encode DIFFERENT docs: unseen words, out-of-alphabet chars
    # (byte fallback), empty and NULL text
    texts = {
        0: "low lower newest",
        1: "unseen zebra low",
        2: "café über low",   # é, ü not in training alphabet
        3: "",
        4: None,
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, list(r.token_ids))
        for r in bpe.bpe_encode(docs, merges, alphabet).collect()
    }
    want = _ref_encode(texts, merges, alphabet)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == (len(want[d]), want[d]), d
    # byte fallback actually fired and stayed in the byte-id range
    assert any(i < bpe.N_BYTE_IDS for i in got[2][1])
    # losslessness: decode ids back to the original text
    inv = {v: k for k, v in bpe.bpe_vocab_ids(merges, alphabet).items()}
    for d, text in texts.items():
        s, buf = [], bytearray()
        for i in got[d][1]:
            if i < bpe.N_BYTE_IDS:
                buf.append(i)
            else:
                if buf:
                    s.append(buf.decode("utf-8"))
                    buf = bytearray()
                s.append(inv[i])
        if buf:
            s.append(buf.decode("utf-8"))
        expect = " ".join(
            w for w in (text or "").lower().strip().split(" ") if w
        )
        assert "".join(s).replace(bpe.END, " ").strip() == expect, d


def test_bpe_encode_counts_match_segment_on_training_corpus(spark):
    """On the training corpus itself (no OOV), bpe_encode's per-doc
    token counts must agree with bpe_segment's count-only contract."""
    docs = _docs(spark, [
        "low lower lowest low low",
        "new newer newest new newer",
    ])
    merges, vocab_df = bpe.learn_bpe(spark, docs, n_merges=8, min_freq=2)
    alphabet = bpe.bpe_alphabet(docs)
    enc = {
        r.doc_id: r.n_tokens
        for r in bpe.bpe_encode(docs, merges, alphabet).collect()
    }
    seg = {
        r.doc_id: r.n_tokens
        for r in bpe.bpe_segment(vocab_df, docs).collect()
    }
    assert enc == seg


def test_sequence_packing_consumes_bpe_token_counts(spark):
    """Tokenizer-aware packing arm: pack_sequences' window math run on
    REAL BPE token counts (not whitespace words) — same split-on-
    boundary semantics, totals conserved, windows sized by the
    tokenizer's own counts."""
    from algoritmos_etl_spark.operators import corpus

    docs = _docs(spark, [
        "low lower lowest low low",
        "new newer newest new newer",
        "low new lower newer wider",
        "wide wider widest",
    ])
    merges, _ = bpe.learn_bpe(spark, docs, n_merges=8, min_freq=2)
    alphabet = bpe.bpe_alphabet(docs)
    enc = bpe.bpe_encode(docs, merges, alphabet)
    packed = corpus.pack_sequences_counted(enc, ctx_len=16)
    rows = {r.doc_id: r for r in packed.collect()}
    counts = {r.doc_id: r.n_tokens for r in enc.collect()}
    assert {d: r.n_tokens for d, r in rows.items()} == counts
    total = sum(counts.values())
    # token_start is a permutation prefix-sum: starts are distinct,
    # each start+len is another doc's start or the total
    starts = sorted(r.token_start for r in rows.values())
    ends = sorted(r.token_start + r.n_tokens for r in rows.values())
    assert starts[0] == 0 and ends[-1] == total
    assert starts[1:] == ends[:-1]
    # window ids follow from the BPE counts
    for r in rows.values():
        assert r.pack_first == r.token_start // 16
        last = max(r.token_start, r.token_start + r.n_tokens - 1)
        assert r.pack_last == last // 16


def test_bpe_decode_inverts_encode_in_spark(spark):
    """The JVM decoder (hex-stream reassembly) must reproduce the
    encoder's normalized text for every document — unseen words,
    multi-byte byte-fallback runs, empty and NULL text."""
    train = _docs(spark, [
        "low lower lowest low low",
        "new newer newest new newer",
        "low new lower newer",
    ])
    merges, _ = bpe.learn_bpe(spark, train, n_merges=10, min_freq=2)
    alphabet = bpe.bpe_alphabet(train)
    texts = {
        0: "low lower newest",
        1: "unseen zebra low",
        2: "café über low",    # multi-byte chars through byte fallback
        3: "",
        4: None,
        5: "LOW New",          # decoder returns the lowercased view
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    enc = bpe.bpe_encode(docs, merges, alphabet)
    got = {
        r.doc_id: r.text
        for r in bpe.bpe_decode(enc, merges, alphabet).collect()
    }
    for d, text in texts.items():
        expect = " ".join(
            w for w in (text or "").lower().strip().split(" ") if w
        )
        assert got[d] == expect, d


# ------------------------------------------------ byte-level grain


MIXED_TEXTS = [
    "Hello, world! It's GPT-2-style.",
    "wörld Grüße — naïve café",
    "日本語のテスト and ASCII mixed42ascii日本x",
    "spaces  double   triple\tand\nnewlines",
    "(x)=1; y[2]+z don't won't 'quoted'",
    " leading space and trailing ",
    "",
    "CamelCase UPPER lower 3.14159 100%",
]


def _ref_pretokens(text):
    import re as _re

    # reference via Python's regex engine (a THIRD implementation
    # besides java.util.regex and RE2): \p{L}/\p{N} rendered as
    # unicode category shorthands Python supports
    pat = (
        r"'s|'t|'re|'ve|'m|'ll|'d"
        r"| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+"
    )
    # [^\W\d_] is letter-ish but excludes '_' which \p{L} also
    # excludes; [^\s\w]+ misses '_' (it is \w), so handle '_' as
    # punctuation explicitly
    pat = pat.replace(r" ?[^\s\w]+", r" ?(?:[^\s\w]|_)+")
    return _re.findall(pat, text)


def test_pretokenizer_three_engine_parity(spark):
    import duckdb
    from pyspark.sql import functions as F

    df = _docs(spark, MIXED_TEXTS)
    got = {
        r["doc_id"]: r["p"]
        for r in df.select(
            "doc_id", bpe.pretokens_col(F.col("text")).alias("p")
        ).collect()
    }
    con = duckdb.connect()
    pat = bpe.PRETOKEN_RE.replace("'", "''")
    for i, t in enumerate(MIXED_TEXTS):
        duck = con.sql(
            f"SELECT regexp_extract_all('{t.replace(chr(39), chr(39)*2)}',"
            f" '{pat}')"
        ).fetchone()[0]
        assert got[i] == duck, f"Spark vs DuckDB diverge on {t!r}"
        assert got[i] == _ref_pretokens(t), f"regex vs re ref on {t!r}"
        # segmentation is a partition of the text
        assert "".join(got[i]) == t
    con.close()


def _ref_bpe_bytes(ptok_freqs: dict[str, int], n_merges: int, min_freq: int):
    vocab = {
        p: [f"{b:02x}" for b in p.encode("utf-8")] for p in ptok_freqs
    }
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, f in ptok_freqs.items():
            t = vocab[w]
            for a, b in zip(t, t[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (left, right), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_freq:
            break
        merges.append((left, right, c))
        for w, t in vocab.items():
            out: list[str] = []
            for x in t:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            vocab[w] = out
    return merges, vocab


def test_learn_bpe_bytes_matches_reference(spark):
    docs = _docs(spark, MIXED_TEXTS)
    merges, tab = bpe.learn_bpe_bytes(spark, docs, n_merges=10, min_freq=2)
    pf = {r["word"]: r["freq"] for r in bpe.pretoken_freqs(docs).collect()}
    ref_merges, ref_vocab = _ref_bpe_bytes(pf, n_merges=10, min_freq=2)
    assert merges == ref_merges
    got = {r["word"]: r["toks"] for r in tab.collect()}
    assert got == ref_vocab
    assert len(merges) > 0


def test_bpe_bytes_roundtrip_identity(spark):
    docs = _docs(spark, MIXED_TEXTS)
    merges, _ = bpe.learn_bpe_bytes(spark, docs, n_merges=8, min_freq=2)
    enc = bpe.bpe_encode_bytes(docs, merges)
    dec = {
        r["doc_id"]: r["text"]
        for r in bpe.bpe_decode_bytes(enc, merges).collect()
    }
    # EXACT identity — not the word grain's normalized view
    for i, t in enumerate(MIXED_TEXTS):
        assert dec[i] == t
    # ids: merged ids appear (>255) and byte ids stay < 256 where
    # no merge covers them; every id is in range
    rows = enc.collect()
    all_ids = [i for r in rows for i in r["token_ids"]]
    assert any(i >= 256 for i in all_ids)
    assert all(0 <= i < 256 + len(merges) for i in all_ids)
    # empty doc encodes to the empty sequence
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[6]["n_tokens"] == 0 and by_id[6]["token_ids"] == []


def test_bpe_bytes_roundtrip_unseen_text(spark):
    # merges learned on one corpus must still encode/decode text with
    # pre-tokens and scripts never seen in training (byte level has
    # no OOV by construction)
    train = _docs(spark, ["the cat sat on the mat", "the dog ran"])
    merges, _ = bpe.learn_bpe_bytes(spark, train, n_merges=6, min_freq=2)
    unseen = ["Ωμέγα β; ¿qué? — ±3·10², 中文", "the theater <th>"]
    docs = _docs(spark, unseen)
    dec = {
        r["doc_id"]: r["text"]
        for r in bpe.bpe_decode_bytes(
            bpe.bpe_encode_bytes(docs, merges), merges
        ).collect()
    }
    assert [dec[i] for i in range(len(unseen))] == unseen
