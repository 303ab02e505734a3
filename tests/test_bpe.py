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


def test_wordpiece_matches_pure_python_greedy(spark):
    """Re-derive vocab + greedy longest-match in pure Python and pin
    the full segmentation of every returned word."""
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    from etl_lens_spark.queries import all_queries

    rows = all_queries()["text_wordpiece_tokenize"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["text"]
    ).to_pandas()
    wf = Counter()
    for t in docs["text"]:
        for w in re.sub(r"\s+", " ", t.lower()).strip().split(" "):
            if w:
                wf[w] += 1
    wf = {w: c for w, c in wf.items() if len(w) <= 16}
    gram_counts = Counter()
    singles = set()
    for w, c in wf.items():
        for p in range(len(w)):
            singles.add((w[p], p == 0))
            for l in range(2, 5):
                if p + l <= len(w):
                    gram_counts[(w[p : p + l], p == 0)] += c
    top = sorted(
        gram_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
    )[:64]
    vocab = singles | {k for k, _ in top}

    def encode(w):
        out, p = [], 0
        while p < len(w):
            for l in range(min(4, len(w) - p), 0, -1):
                s = w[p : p + l]
                if (s, p == 0) in vocab:
                    out.append(s if p == 0 else "##" + s)
                    p += l
                    break
        return out

    assert rows
    for r in rows:
        want = encode(r.word)
        assert r.freq == wf[r.word]
        assert r.n_pieces == len(want)
        assert r.pieces == " ".join(want), (r.word, r.pieces, want)
        # reconstruction: stripping markers rebuilds the word
        assert r.pieces.replace(" ##", "").replace(" ", "") == r.word
