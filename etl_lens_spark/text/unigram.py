"""Unigram-LM (SentencePiece-style) subword tokenizer.

Completes the tokenizer family next to ``text/bpe.py``: where BPE
greedily merges pairs, the unigram model scores every substring piece
by corpus log-frequency and Viterbi-segments each word into its
maximum-likelihood piece sequence (Kudo 2018, simplified: one
frequency pass instead of EM — the piece scores are deterministic
corpus statistics, so both the candidate table and the segmentation
are exactly reproducible).

Distributed shape (the part that matters at 100 TB):
- piece candidates come from the DISTINCT-word vocab, not the corpus:
  the corpus is touched once for (word, freq), after which every
  stage is O(|vocab| · max_len²) regardless of corpus size;
- the selected vocab (a few hundred rows) broadcasts into ONE
  Arrow-batched Viterbi UDF over distinct words — each word is
  segmented once no matter how often it occurs;
- per-document stats come from joining the tiny (word → n_pieces)
  table back on the word key.

Sequential-by-definition pieces (the DP itself) are pinned bit-exact
against a pure-Python reference in tests/test_unigram.py, same
strategy as the BPE trainer.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_PIECE_LEN = 8


def piece_candidates(vocab: DataFrame, max_len: int = MAX_PIECE_LEN) -> DataFrame:
    """(piece, freq) for every substring of length 1..max_len of every
    vocab word, weighted by word frequency.

    The explode is per DISTINCT word (bounded fan-out ≤ L·max_len per
    word), then one map-side-combining groupBy on the piece key.
    """
    starts = F.sequence(F.lit(1), F.length("word"))
    lens = F.sequence(
        F.lit(1), F.least(F.lit(max_len), F.length("word"))
    )
    return (
        vocab.select("word", "freq", F.explode(starts).alias("i"))
        .select("word", "freq", "i", F.explode(lens).alias("l"))
        .filter(F.col("i") + F.col("l") - 1 <= F.length("word"))
        .select(F.expr("substr(word, i, l)").alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("freq"))
    )


def select_vocab(
    cands: DataFrame, n_multi: int = 192
) -> DataFrame:
    """Pick the piece vocabulary: ALL single characters (so every
    word stays segmentable) plus the top ``n_multi`` multi-char
    pieces by (freq desc, piece asc) — a deterministic total order.

    The candidate table is already reduced (distinct pieces), so the
    top-k is a tiny sort, not a corpus-scale one.
    """
    singles = cands.filter(F.length("piece") == 1)
    multi = (
        cands.filter(F.length("piece") >= 2)
        .orderBy(F.col("freq").desc(), F.col("piece"))
        .limit(n_multi)
    )
    return singles.unionByName(multi)


def viterbi_encode(
    words: DataFrame, vocab_rows: list[tuple[str, int]]
) -> DataFrame:
    """Maximum-likelihood segmentation of each distinct word.

    ``vocab_rows`` is the collected (piece, freq) vocab — a few
    hundred entries, folded driver-side into log-probabilities
    p(piece) = freq / total and broadcast inside one Arrow-batched
    UDF. DP: best[j] = max_i best[i] + logp(word[i:j]); ties keep the
    smallest i (the longest final piece) — the same deterministic
    rule as the reference implementation in tests.
    """
    total = float(sum(f for _, f in vocab_rows))
    logp = {p: math.log(f / total) for p, f in vocab_rows}
    max_len = max((len(p) for p, _ in vocab_rows), default=1)

    @F.pandas_udf("array<string>")
    def seg(col: pd.Series) -> pd.Series:
        out = []
        for w in col:
            n = len(w)
            best = [float("-inf")] * (n + 1)
            back = [0] * (n + 1)
            best[0] = 0.0
            for j in range(1, n + 1):
                for i in range(max(0, j - max_len), j):
                    lp = logp.get(w[i:j])
                    if lp is None or best[i] == float("-inf"):
                        continue
                    cand = best[i] + lp
                    if cand > best[j]:
                        best[j] = cand
                        back[j] = i
            if best[n] == float("-inf"):  # unsegmentable (no chars)
                out.append([w])
                continue
            pieces, j = [], n
            while j > 0:
                i = back[j]
                pieces.append(w[i:j])
                j = i
            out.append(pieces[::-1])
        return pd.Series(out)

    return words.select(
        "word",
        "freq",
        seg(F.col("word")).alias("pieces"),
    ).withColumn("n_pieces", F.size("pieces").cast("long"))
