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


@query(
    "text_unigram_piece_counts",
    oracle=f"""
    WITH {_WF_SQL},
    p AS (
        SELECT substr(word, i, l) AS piece, freq
        FROM wf,
             LATERAL (SELECT unnest(range(1, len(word) + 1)) AS i) u,
             LATERAL (SELECT unnest(range(1, least(8, len(word)) + 1)) AS l) v
        WHERE i + l - 1 <= len(word)
    )
    SELECT piece, CAST(SUM(freq) AS BIGINT) AS freq
    FROM p GROUP BY piece
    ORDER BY freq DESC, piece
    LIMIT 40
    """,
)
def text_unigram_piece_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM candidate-piece statistics (text/unigram.py): every
    substring of length ≤ 8 of every DISTINCT word, weighted by word
    frequency — the table the SentencePiece-style vocabulary is
    selected from, and the oracle-checked anchor of the unigram
    tokenizer family (the Viterbi segmentation itself is pinned vs a
    pure-Python reference in tests/test_unigram.py). Top 40 by
    (freq desc, piece asc) — a deterministic total order.

    Corpus is touched once for (word, freq); the substring explode
    fans out over the distinct-word vocab only, then one map-side-
    combining groupBy reduces piece keys."""
    from etl_lens_spark.text import unigram

    docs = load_table(spark, sf_dir, "documents")
    cands = unigram.piece_candidates(bpe.word_freqs(docs))
    return cands.orderBy(F.col("freq").desc(), F.col("piece")).limit(40)


@query("text_unigram_tokenize")
def text_unigram_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[N] Maximum-likelihood unigram-LM segmentation of the corpus
    (rows-only: the Viterbi DP is sequential-by-definition; exact
    parity with a pure-Python reference plus lossless-reassembly and
    vocab-membership invariants are pinned in tests/test_unigram.py).
    Per document: word count, unigram-piece count, chars-per-piece
    compression — directly comparable to text_bpe_encode_stats, the
    BPE twin over the same corpus.

    Every distinct word is segmented ONCE in one Arrow-batched UDF
    with the few-hundred-row piece vocab broadcast inside it;
    documents get counts back through the word-key join the explode
    already shuffled on."""
    from etl_lens_spark.text import unigram

    docs = load_table(spark, sf_dir, "documents")
    wf = bpe.word_freqs(docs)
    vocab = unigram.select_vocab(unigram.piece_candidates(wf))
    vocab_rows = [(r["piece"], r["freq"]) for r in vocab.collect()]
    enc = unigram.viterbi_encode(wf, vocab_rows).select("word", "n_pieces")
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
            F.sum("n_pieces").cast("long").alias("n_unigram_pieces"),
            F.sum(F.length("word")).cast("long").alias("n_chars"),
        )
        .withColumn(
            "chars_per_piece",
            F.col("n_chars").cast("double") / F.col("n_unigram_pieces"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# WordPiece greedy tokenizer — full segmentation oracle-checked
# ---------------------------------------------------------------------------

_WP_TOPK = 64  # multi-char vocab size (singles always included)
_WP_MAXP = 4  # max piece length
_WP_MAXW = 16  # max word length considered
_WP_OUT = 40  # output rows


@query(
    "text_wordpiece_tokenize",
    oracle=f"""
    WITH RECURSIVE {_WF_SQL},
    wfl AS (SELECT * FROM wf WHERE length(word) <= {_WP_MAXW}),
    cand AS (
        SELECT word, freq, CAST(u.pos AS BIGINT) AS pos,
               CAST(v.l AS BIGINT) AS l,
               substr(word, u.pos, v.l) AS s, (u.pos = 1) AS initial
        FROM wfl,
             LATERAL (SELECT unnest(range(1, length(word) + 1)) AS pos) u,
             LATERAL (SELECT unnest(range(1, {_WP_MAXP + 1})) AS l) v
        WHERE u.pos + v.l - 1 <= length(word)
    ),
    multi AS (
        SELECT s, l, initial
        FROM (
            SELECT s, l, initial, CAST(SUM(freq) AS BIGINT) AS c
            FROM cand WHERE l >= 2 GROUP BY s, l, initial
        ) ORDER BY c DESC, s, initial LIMIT {_WP_TOPK}
    ),
    vocab AS (
        SELECT DISTINCT s, l, initial FROM cand WHERE l = 1
        UNION ALL
        SELECT s, l, initial FROM multi
    ),
    best AS (
        SELECT c.word, c.pos,
               max_by(CASE WHEN v.initial THEN v.s
                           ELSE '##' || v.s END, v.l) AS piece,
               MAX(v.l) AS plen
        FROM cand c JOIN vocab v USING (s, l, initial)
        GROUP BY c.word, c.pos
    ),
    walk AS (
        SELECT word, freq, CAST(1 AS BIGINT) AS pos,
               '' AS toks, CAST(0 AS BIGINT) AS n
        FROM wfl
        UNION ALL
        SELECT w.word, w.freq, w.pos + b.plen,
               w.toks || CASE WHEN w.pos = 1 THEN '' ELSE ' ' END
                      || b.piece,
               w.n + 1
        FROM walk w JOIN best b ON b.word = w.word AND b.pos = w.pos
        WHERE w.pos <= length(w.word)
    )
    SELECT word, freq, n AS n_pieces, toks AS pieces
    FROM walk WHERE pos = length(word) + 1
    ORDER BY freq DESC, word LIMIT {_WP_OUT}
    """,
)
def text_wordpiece_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[N] WordPiece greedy longest-match tokenization with the FULL
    segmentation oracle-checked — the third tokenizer family next to
    BPE (merge-rule) and unigram-LM (Viterbi), and the only one whose
    complete encode is cross-engine verified, not just its statistics.

    Vocab = every single character (coverage guarantee — no [UNK]
    path needed) plus the top-{_WP_TOPK} frequency-weighted substrings
    of length 2..{_WP_MAXP}, position-split into word-initial pieces
    and '##'-marked continuation pieces, exactly BERT's convention.
    The greedy choice at a position depends only on (word, pos), so
    the longest-match table is precomputed as ONE join + max_by
    aggregate — the recursion (DuckDB WITH RECURSIVE; Spark
    operators/fixpoint.iterate_fixpoint, ≤{_WP_MAXW}+1 bounded
    iterations with O(1) lineage) is then a pure pointer walk that
    both engines execute identically.

    Scale posture: the corpus collapses to the (word, freq) vocab
    table in the first aggregate — everything downstream (candidate
    grams, top-K, the walk) is vocab-scale, the same argument that
    makes BPE training distributable. Top-{_WP_OUT} most frequent
    words returned with their segmentations (deterministic
    freq-desc/word tie-break)."""
    done = wordpiece_segment_words(spark, sf_dir)
    return (
        done.select(
            "word",
            "freq",
            F.col("n").alias("n_pieces"),
            F.col("toks").alias("pieces"),
        )
        .orderBy(F.desc("freq"), "word")
        .limit(_WP_OUT)
    )


def wordpiece_segment_words(
    spark: SparkSession, sf_dir: str, wf: DataFrame | None = None
) -> DataFrame:
    """Per-distinct-word WordPiece greedy segmentation over the corpus
    vocab (words ≤ _WP_MAXW chars): returns (word, freq, pos, toks, n)
    with pos == len(word)+1 ⇔ fully segmented. Shared by the
    oracle-checked text_wordpiece_tokenize and the tokenizer-fertility
    comparison (npipe7) — pass a pre-built, pre-filtered (word, freq)
    frame via ``wf`` to skip the corpus re-scan."""
    from etl_lens_spark.operators.fixpoint import iterate_fixpoint

    if wf is None:
        docs = load_table(spark, sf_dir, "documents")
        wf = bpe.word_freqs(docs).filter(F.length("word") <= _WP_MAXW)
    pos = wf.select(
        "word",
        "freq",
        F.explode(
            F.sequence(F.lit(1).cast("long"), F.length("word").cast("long"))
        ).alias("pos"),
    )
    cand = (
        pos.select(
            "word",
            "freq",
            "pos",
            F.explode(
                F.sequence(
                    F.lit(1).cast("long"),
                    F.least(
                        F.lit(_WP_MAXP).cast("long"),
                        (F.length("word") - F.col("pos") + 1).cast("long"),
                    ),
                )
            ).alias("l"),
        )
        .select(
            "word",
            "freq",
            "pos",
            "l",
            F.expr("substring(word, pos, l)").alias("s"),
            (F.col("pos") == 1).alias("initial"),
        )
    )
    multi = (
        cand.filter(F.col("l") >= 2)
        .groupBy("s", "l", "initial")
        .agg(F.sum("freq").cast("long").alias("c"))
        .orderBy(F.desc("c"), "s", "initial")
        .limit(_WP_TOPK)
        .select("s", "l", "initial")
    )
    singles = (
        cand.filter(F.col("l") == 1).select("s", "l", "initial").distinct()
    )
    vocab = singles.unionByName(multi)
    best = (
        cand.join(F.broadcast(vocab), ["s", "l", "initial"])
        .groupBy("word", "pos")
        .agg(
            F.max_by(
                F.when(F.col("initial"), F.col("s")).otherwise(
                    F.concat(F.lit("##"), F.col("s"))
                ),
                F.col("l"),
            ).alias("piece"),
            F.max("l").alias("plen"),
        )
    )
    init = wf.select(
        "word",
        "freq",
        F.lit(1).cast("long").alias("pos"),
        F.lit("").alias("toks"),
        F.lit(0).cast("long").alias("n"),
    )

    def step(st):
        j = st.join(best, ["word", "pos"], "left")
        active = F.col("pos") <= F.length("word")
        sep = F.when(F.col("pos") == 1, F.lit("")).otherwise(F.lit(" "))
        return j.select(
            "word",
            "freq",
            F.when(active, F.col("pos") + F.col("plen"))
            .otherwise(F.col("pos"))
            .alias("pos"),
            F.when(active, F.concat(F.col("toks"), sep, F.col("piece")))
            .otherwise(F.col("toks"))
            .alias("toks"),
            F.when(active, F.col("n") + 1).otherwise(F.col("n")).alias("n"),
            active.alias("__changed"),
        )

    done = iterate_fixpoint(init, step, max_iter=_WP_MAXW + 1)
    return done.filter(F.col("pos") == F.length("word") + 1)
