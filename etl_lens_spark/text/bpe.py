"""Byte-pair-encoding tokenizer: distributed training + encoding.

BPE (Sennrich et al. 2016, arXiv:1508.07909 — public paper) is the
tokenizer family behind every modern LLM vocabulary. The
Spark-shaped decomposition:

1. **Word-frequency table** — the only corpus-scale pass. 100 TB of
   text collapses to (word, freq) with one map-side-combined groupBy;
   everything after runs on the vocab table (|distinct words|, ~10⁶
   rows at web scale — thousands of times smaller than the corpus).
2. **Merge training** — the classic iterative loop, each iteration a
   pair-count aggregation over the vocab DataFrame (weighted by word
   freq) + an argmax + one merge application. Pair counting is
   exact and distributed; the merge apply is an Arrow-batched UDF
   doing the leftmost non-overlapping scan per word (sequential by
   definition — not expressible as a built-in array op).
3. **Encoding** — apply the learned merge list (tiny, broadcast) to
   each distinct word once, then join token counts back to documents.

Determinism: ties in the pair argmax break by (count desc, left asc,
right asc); merge application is the standard leftmost
non-overlapping scan. tests/test_bpe.py pins exact parity with a
pure-Python reference implementation.

Reference parity: the reference has no text analytics (its decode
stops at formatting event properties, src/main.cpp:339-414); this is
[N] north-star surface.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the one corpus-scale pass."""
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "
    )
    return (
        docs.select(F.explode(toks).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def _merge_apply_udf(left: str, right: str):
    """Leftmost non-overlapping (left, right) -> left+right merge over
    a symbol array — the sequential BPE scan, Arrow-batched."""
    merged = left + right

    @F.pandas_udf("array<string>")
    def apply(sym: pd.Series) -> pd.Series:
        out = []
        for syms in sym:
            res, i, n = [], 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            out.append(res)
        return pd.Series(out)

    return apply


def train_merges(vocab: DataFrame, n_merges: int) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from a (word, freq) vocab table.

    Returns [(left, right, pair_freq), ...] in merge order. Each
    iteration: one pair-count aggregation (adjacent symbol pairs,
    weighted by freq, built with built-in array ops), one 1-row
    argmax, one merge application. The vocab frame is persisted and
    swapped per iteration so the lineage stays one UDF deep."""
    cur = vocab.select(
        "word", "freq", F.split(F.col("word"), "").alias("sym")
    )
    cur = cur.persist()
    cur.count()
    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(n_merges):
            pairs = (
                cur.filter(F.size("sym") >= 2)
                .select(
                    "freq",
                    F.explode(
                        F.expr(
                            "transform(sequence(0, size(sym)-2), "
                            "i -> struct(sym[i] AS l, sym[i+1] AS r))"
                        )
                    ).alias("p"),
                )
                .groupBy("p.l", "p.r")
                .agg(F.sum("freq").cast("long").alias("c"))
            )
            # argmax as ONE aggregation, not a sort: min over a struct
            # whose ordering (-count, left, right) encodes the
            # tie-break — the election reduces map-side to one
            # candidate per partition
            top_row = pairs.agg(
                F.min(
                    F.struct(
                        (-F.col("c")).alias("negc"),
                        F.col("l"),
                        F.col("r"),
                        F.col("c"),
                    )
                ).alias("t")
            ).first()
            top = top_row["t"] if top_row is not None else None
            if top is None or top["c"] < 2:
                break
            merges.append((top["l"], top["r"], int(top["c"])))
            nxt = cur.withColumn(
                "sym", _merge_apply_udf(top["l"], top["r"])(F.col("sym"))
            ).persist()
            nxt.count()
            cur.unpersist()
            cur = nxt
    finally:
        cur.unpersist()
    return merges


def encode_words(vocab: DataFrame, merges: list[tuple[str, str, int]]) -> DataFrame:
    """Apply the learned merge list in order to every distinct word:
    (word, tokens array, n_tokens). The merge list is driver-side
    data folded into one Arrow-batched UDF — each word is encoded
    once regardless of its corpus frequency."""
    pairs = [(l, r) for l, r, _ in merges]

    @F.pandas_udf("array<string>")
    def enc(words: pd.Series) -> pd.Series:
        out = []
        for w in words:
            syms = list(w)
            for left, right in pairs:
                res, i, n = [], 0, len(syms)
                while i < n:
                    if (
                        i + 1 < n
                        and syms[i] == left
                        and syms[i + 1] == right
                    ):
                        res.append(left + right)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                syms = res
            out.append(syms)
        return pd.Series(out)

    return vocab.select(
        "word",
        "freq",
        enc(F.col("word")).alias("tokens"),
    ).withColumn("n_tokens", F.size("tokens").cast("long"))
