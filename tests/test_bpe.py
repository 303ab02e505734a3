"""BPE trainer/encoder: exact parity with a pure-Python reference."""

from __future__ import annotations

import re
from collections import Counter

SF = "/root/testdata/sf0.001"


def _ref_word_freqs(texts):
    c = Counter()
    for t in texts:
        for w in re.sub(r"\s+", " ", t.lower()).strip().split(" "):
            if w:
                c[w] += 1
    return c


def _ref_apply(syms, left, right):
    res, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            res.append(left + right)
            i += 2
        else:
            res.append(syms[i])
            i += 1
    return res


def _ref_train(freqs, n_merges):
    vocab = {w: list(w) for w in freqs}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, syms in vocab.items():
            f = freqs[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < 2:
            break
        merges.append((l, r, c))
        vocab = {w: _ref_apply(s, l, r) for w, s in vocab.items()}
    return merges, vocab


def test_train_merges_matches_reference(spark):
    from etl_lens_spark.text import bpe

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    texts = [r["text"] for r in docs.select("text").collect()]
    freqs = _ref_word_freqs(texts)

    got = bpe.train_merges(bpe.word_freqs(docs), 8)
    want, _ = _ref_train(freqs, 8)
    assert got == want


def test_encode_words_matches_reference_and_reconstructs(spark):
    from etl_lens_spark.text import bpe

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    texts = [r["text"] for r in docs.select("text").collect()]
    freqs = _ref_word_freqs(texts)
    wf = bpe.word_freqs(docs)
    merges = bpe.train_merges(wf, 8)
    want_merges, want_vocab = _ref_train(freqs, 8)
    assert merges == want_merges

    enc = {
        r["word"]: list(r["tokens"])
        for r in bpe.encode_words(wf, merges).collect()
    }
    assert enc == want_vocab
    # tokens always reconstruct the word exactly
    for w, toks in enc.items():
        assert "".join(toks) == w


def test_pair_counts_query_weighted_by_freq(spark):
    from etl_lens_spark.queries import REGISTRY, _load

    _load()
    rows = REGISTRY["text_bpe_pair_counts"].fn(spark, SF).collect()
    assert len(rows) == 20
    assert all(rows[i]["c"] >= rows[i + 1]["c"] for i in range(19))

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    texts = [r["text"] for r in docs.select("text").collect()]
    freqs = _ref_word_freqs(texts)
    pc = Counter()
    for w, f in freqs.items():
        for a, b in zip(w, w[1:]):
            pc[(a, b)] += f
    for r in rows:
        assert pc[(r["l"], r["r"])] == r["c"]
