"""Unigram-LM tokenizer (text/unigram.py): bit-exact parity of the
distributed Viterbi segmentation with a pure-Python reference,
lossless reassembly, vocab membership, and DP optimality vs brute
force on short words."""

from __future__ import annotations

import itertools
import math

from pyspark.sql import functions as F

from etl_lens_spark.sources.tables import load_table
from etl_lens_spark.text import bpe, unigram


def _ref_viterbi(word: str, logp: dict[str, float], max_len: int):
    """Reference DP, independently written: best[j] = max_i best[i] +
    logp(word[i:j]); ties keep the smallest i."""
    n = len(word)
    best = [float("-inf")] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            lp = logp.get(word[i:j])
            if lp is None or best[i] == float("-inf"):
                continue
            if best[i] + lp > best[j]:
                best[j] = best[i] + lp
                back[j] = i
    pieces, j = [], n
    while j > 0:
        pieces.append(word[back[j] : j])
        j = back[j]
    return pieces[::-1]


def _vocab(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    wf = bpe.word_freqs(docs)
    vocab = unigram.select_vocab(unigram.piece_candidates(wf))
    return wf, [(r["piece"], r["freq"]) for r in vocab.collect()]


def test_viterbi_matches_pure_python_reference(spark, sf_dir):
    wf, vocab_rows = _vocab(spark, sf_dir)
    total = float(sum(f for _, f in vocab_rows))
    logp = {p: math.log(f / total) for p, f in vocab_rows}
    max_len = max(len(p) for p, _ in vocab_rows)
    enc = unigram.viterbi_encode(wf, vocab_rows).collect()
    assert len(enc) > 20
    for r in enc:
        assert r["pieces"] == _ref_viterbi(r["word"], logp, max_len), r


def test_segmentation_is_lossless_and_in_vocab(spark, sf_dir):
    wf, vocab_rows = _vocab(spark, sf_dir)
    pieces_set = {p for p, _ in vocab_rows}
    for r in unigram.viterbi_encode(wf, vocab_rows).collect():
        assert "".join(r["pieces"]) == r["word"], r
        assert all(p in pieces_set for p in r["pieces"]), r
        assert r["n_pieces"] == len(r["pieces"])


def test_viterbi_is_optimal_vs_bruteforce(spark, sf_dir):
    # enumerate ALL segmentations of short words; the DP score must
    # equal the brute-force maximum
    wf, vocab_rows = _vocab(spark, sf_dir)
    total = float(sum(f for _, f in vocab_rows))
    logp = {p: math.log(f / total) for p, f in vocab_rows}
    short = wf.filter(F.length("word").between(2, 6)).limit(25)
    enc = {
        r["word"]: r["pieces"]
        for r in unigram.viterbi_encode(short, vocab_rows).collect()
    }
    assert enc
    for word, pieces in enc.items():
        n = len(word)
        best = float("-inf")
        for cuts in itertools.product([0, 1], repeat=n - 1):
            bounds = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
            segs = [word[a:b] for a, b in zip(bounds, bounds[1:])]
            if all(s in logp for s in segs):
                best = max(best, sum(logp[s] for s in segs))
        got = sum(logp[p] for p in pieces)
        assert math.isclose(got, best, rel_tol=1e-12), (word, pieces, best)


def test_single_char_fallback(spark):
    # a vocab with only single chars still segments every word
    rows = [("a", 5), ("b", 3), ("c", 2)]
    wf = spark.createDataFrame(
        [("abcba", 1), ("cab", 2)], "word string, freq long"
    )
    for r in unigram.viterbi_encode(wf, rows).collect():
        assert r["pieces"] == list(r["word"])
