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
