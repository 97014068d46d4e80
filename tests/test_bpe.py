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
