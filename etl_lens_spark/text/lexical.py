"""Lexical retrieval index algebra — the ONE definition of
tokenization, postings, BM25 scoring, and phrase adjacency shared by
the build-once queries (text_bm25_search, text_phrase_search,
rank_rrf_fusion in npipe5/npipe8) and the CDF-maintained index
family (npipe13), so the two paths cannot drift — the same
anti-drift discipline the ANN family uses (similarity/ivf.py
assign/probe shared by sim_ann_* build-once and incremental twins).

The maintained-index data model (round-11 VERDICT item 1):

- **postings lake table**: rows ``(term, doc_id, tf, dlen)``. The
  document length rides every posting row because it is a property
  of the IMMUTABLE document (document updates are delete+insert in
  the CDF) — so BM25 serving needs NO join back to a doc-length
  table, and insert maintenance is pure O(delta) tokenize+append.
- **positional lake table**: rows ``(doc_id, pos, term)``, 1-based
  positions — the phrase-search index; same append/anti-join
  maintenance.
- **frozen statistics**: ``(n_docs, avgdl)`` and per-term ``df`` are
  captured at (re-)stat time and FIXED between re-stats — the exact
  analog of the IVF fixed-centroid contract: with stats frozen,
  a posting row's score contribution is a pure function of the row,
  so maintained ≡ rebuilt is decidable by row-set equality, and the
  drift between frozen and current statistics is a measurable DIAL
  (``bm25 top-k overlap frozen-vs-current``), not silent skew.

Scale shape (the 100 TB story): tokenization is JVM-side
split+posexplode (no Python in the hot path); postings group by
(doc_id, term) — well-distributed keys; serving filters postings to
the query vocabulary BEFORE any shuffle (the inverted-index
discipline; with the lake table bucketed/clustered by term this is a
pruned read); maintenance is O(delta docs) tokenize + append plus
one O(index) anti-join per delete batch (shardable by the term
bucket at scale, same note as lakelog.rewrite_minus_ids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75


def positional_tokens(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, pos, term) with 1-BASED positions — the whitespace-
    lowercase tokenization every lexical query in the repo uses
    (Spark posexplode is 0-based and shifts by one; DuckDB's
    unnest(range(...)) oracle counts from 1)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.lower(F.col(text_col)), " ")).alias(
            "p0", "term"
        ),
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "term")


def postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Denormalized postings rows ``(term, doc_id, tf, dlen)`` for a
    batch of documents — the unit both the seed build and the
    O(delta) insert maintenance append (dlen is computed WITHIN the
    batch because it is a per-document property, valid regardless of
    what else the index holds). One (doc_id, term) aggregate plus a
    doc_id window for the length — no join."""
    tf = (
        positional_tokens(docs, id_col, text_col)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    return tf.select(
        "term",
        "doc_id",
        "tf",
        F.sum("tf")
        .over(Window.partitionBy("doc_id"))
        .cast("long")
        .alias("dlen"),
    )


def corpus_stats(postings_df: DataFrame) -> tuple[int, float]:
    """``(n_docs, avgdl)`` from postings rows — the global half of
    the frozen statistics. Driver-sized: one distinct-doc aggregate
    returns two scalars."""
    r = (
        postings_df.groupBy("doc_id")
        .agg(F.first("dlen").alias("dlen"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.avg("dlen").alias("avgdl"),
        )
        .first()
    )
    return int(r["n_docs"]), float(r["avgdl"])


def df_stats(postings_df: DataFrame, terms: list[str]) -> dict[str, int]:
    """Per-term document frequency for the probe vocabulary — the
    per-term half of the frozen statistics. Postings are filtered to
    the query terms BEFORE the aggregate (broadcast-sized result)."""
    rows = (
        postings_df.filter(F.col("term").isin(list(terms)))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .collect()
    )
    return {r["term"]: int(r["df"]) for r in rows}


def bm25_topk(
    postings_df: DataFrame,
    terms: list[str],
    n_docs: int,
    avgdl: float,
    df_map: dict[str, int],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 top-k ``(doc_id, rank, score)`` served from a postings
    frame under GIVEN statistics — the statistics are parameters
    precisely so the maintained path can serve under its FROZEN
    (n_docs, avgdl, df) while audits recompute current ones; same
    Robertson/Sparck Jones formula as text_bm25_search (k1=1.2,
    b=0.75). A query term absent from the given df map scores with
    df=0 (maximally informative — the unseen-term convention, which
    both the maintained and rebuilt sides share so equality pins
    stay meaningful).

    Plan: postings filtered to the query vocabulary before any
    shuffle; per-doc sum over ≤ |terms| rows; TakeOrdered truncation
    then a tiny window over the driver-sized list."""
    spark = postings_df.sparkSession
    stats = F.broadcast(
        spark.createDataFrame(
            [(t, int(df_map.get(t, 0))) for t in terms],
            "term string, df long",
        )
    )
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5)
        / (F.col("df") + 0.5)
        + 1.0
    )
    contrib = (
        idf
        * F.col("tf")
        * (k1 + 1.0)
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dlen") / F.lit(float(avgdl)))
        )
    )
    scored = (
        postings_df.filter(F.col("term").isin(list(terms)))
        .join(stats, "term")
        .groupBy("doc_id")
        .agg(F.sum(contrib).alias("score"))
    )
    return (
        scored.orderBy(F.col("score").desc(), "doc_id")
        .limit(k)
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.col("score").desc(), "doc_id"))
            .cast("long"),
        )
        .select("doc_id", "rank", "score")
    )


def phrase_hits(
    pos_index: DataFrame, phrase: list[str]
) -> DataFrame:
    """Exact-phrase matches ``(doc_id, n_occurrences, first_pos)``
    from a positional index frame (positional_tokens rows) — the
    adjacency-join chain text_phrase_search uses, factored so the
    maintained positional lake table serves through the identical
    code. Postings filter to the phrase terms before anything
    shuffles; the chain is |phrase|−1 equi-joins on
    (doc_id, start_pos)."""
    post = pos_index.filter(F.col("term").isin(list(phrase)))
    hits = None
    for i, w in enumerate(phrase):
        p = post.filter(F.col("term") == w).select(
            "doc_id", (F.col("pos") - i).alias("start_pos")
        )
        hits = p if hits is None else hits.join(
            p, ["doc_id", "start_pos"]
        )
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.min("start_pos").cast("long").alias("first_pos"),
    )


def stats_to_df(
    spark, n_docs: int, avgdl: float, df_map: dict[str, int], epoch: int
) -> DataFrame:
    """The frozen BM25 statistics as rows ``(kind, term, val,
    epoch)`` — the persistence format that lets the statistics live
    as a MEMBER REL of the postings table's own lake log, so one
    atomic multi-table commit swaps them and a reader resolving any
    version serves under exactly one statistics epoch (the
    text_bm25_restats_swap zero-downtime contract; the lexical
    analog of ivf.centroids_to_df). 2 + |vocabulary| rows —
    driver-sized."""
    rows = [
        ("n_docs", "", float(n_docs), int(epoch)),
        ("avgdl", "", float(avgdl), int(epoch)),
    ] + [
        ("df", t, float(d), int(epoch))
        for t, d in sorted(df_map.items())
    ]
    return spark.createDataFrame(
        rows, "kind string, term string, val double, epoch int"
    )


def stats_from_df(
    stats_df: DataFrame,
) -> tuple[int, float, dict[str, int], int]:
    """Inverse of stats_to_df: ``(n_docs, avgdl, df_map, epoch)``
    from the stats member rel at one version. RAISES if the rows
    carry more than one epoch — mixed-epoch statistics ARE a torn
    index state (scores under n_docs from one epoch and df from
    another are meaningless), which the atomic swap makes
    impossible; raising turns any regression into a loud failure
    instead of silently mis-ranking."""
    rows = stats_df.collect()
    epochs = {r["epoch"] for r in rows}
    if len(epochs) != 1:
        raise ValueError(
            f"torn statistics state: epochs {sorted(epochs)} in one "
            "snapshot (the atomic swap contract is broken)"
        )
    kv = {(r["kind"], r["term"]): r["val"] for r in rows}
    n_docs = int(kv[("n_docs", "")])
    avgdl = float(kv[("avgdl", "")])
    df_map = {
        t: int(v) for (k, t), v in kv.items() if k == "df"
    }
    return n_docs, avgdl, df_map, epochs.pop()
