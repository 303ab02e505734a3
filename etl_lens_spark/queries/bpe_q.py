"""BPE tokenizer queries: pair statistics (oracle-checked), merge
training and corpus encoding (rows-only — the merge loop is
sequential-by-definition; tests/test_bpe.py pins exact parity with a
pure-Python reference implementation instead)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_lens_spark.queries import query
from etl_lens_spark.sources.tables import load_table
from etl_lens_spark.text import bpe

N_MERGES = 8

_WF_SQL = """
    w AS (
        SELECT unnest(string_split(trim(regexp_replace(lower(text),
                   '\\s+', ' ', 'g')), ' ')) AS word
        FROM documents
    ),
    wf AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
        FROM w WHERE word <> '' GROUP BY word
    )
"""


@query(
    "text_bpe_pair_counts",
    oracle=f"""
    WITH {_WF_SQL},
    p AS (
        SELECT substr(word, i, 1) AS l, substr(word, i + 1, 1) AS r,
               freq
        FROM wf, LATERAL (SELECT unnest(range(1, len(word))) AS i) u
    )
    SELECT l, r, CAST(SUM(freq) AS BIGINT) AS c
    FROM p GROUP BY l, r
    ORDER BY c DESC, l, r
    LIMIT 20
    """,
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[N] the BPE trainer's first iteration, oracle-checked: top-20
    adjacent character pairs across the corpus, weighted by word
    frequency. The corpus collapses to the (word, freq) vocab table
    first (the 100 TB pass), so pair counting touches |vocab| rows —
    the structural reason BPE training scales at all."""
    docs = load_table(spark, sf_dir, "documents")
    wf = bpe.word_freqs(docs)
    pairs = (
        wf.select("freq", F.split("word", "").alias("sym"))
        .filter(F.size("sym") >= 2)
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
    return pairs.orderBy(F.desc("c"), "l", "r").limit(20)


@query("text_bpe_train_merges")
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[N] full BPE merge training (rows-only): 8 merges learned from
    the vocab table, each iteration one distributed pair-count
    aggregation + a 1-row argmax + an Arrow-batched merge scan.
    Deterministic: ties break (count desc, left, right); parity with
    a pure-Python reference is pinned in tests/test_bpe.py."""
    docs = load_table(spark, sf_dir, "documents")
    merges = bpe.train_merges(bpe.word_freqs(docs), N_MERGES)
    return spark.createDataFrame(
        [
            (i + 1, l, r, l + r, c)
            for i, (l, r, c) in enumerate(merges)
        ],
        "merge_rank int, left string, right string, merged string, "
        "pair_freq long",
    )


@query("text_bpe_encode_stats")
def text_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[N] corpus encoding with the learned merges (rows-only):
    per-document word count, BPE token count, and chars-per-token
    compression. Each DISTINCT word is encoded once (vocab-sized UDF
    work); documents get their counts back through a word join —
    the join key is the word the explode already shuffled on."""
    docs = load_table(spark, sf_dir, "documents")
    wf = bpe.word_freqs(docs)
    merges = bpe.train_merges(wf, N_MERGES)
    enc = bpe.encode_words(wf, merges).select("word", "n_tokens")
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " "
    )
    doc_words = (
        docs.select("doc_id", F.explode(toks).alias("word"))
        .filter(F.col("word") != "")
    )
    return (
        doc_words.join(enc, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_tokens").cast("long").alias("n_bpe_tokens"),
            F.sum(F.length("word")).cast("long").alias("n_chars"),
        )
        .withColumn(
            "chars_per_token",
            F.col("n_chars").cast("double") / F.col("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    )
