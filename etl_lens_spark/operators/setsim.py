"""Exact set-similarity joins with prefix + positional filtering
(AllPairs / PPJoin family — Chaudhuri et al. 2006, Xiao et al. 2008,
public papers).

Both entry points are EXACT: every filter is provably lossless (the
first common token under the global rare-first order lies inside
both prefixes and satisfies the positional overlap bound for any
qualifying pair), so results equal the quadratic join's bit-for-bit
— verified by DuckDB oracles and an in-suite brute-force equality
test.

- :func:`jaccard_self_join` — all pairs within one collection
  (corpus-wide dedup sweep).
- :func:`jaccard_rs_join` — probe collection vs indexed collection
  (the nightly incremental shape: today's crawl against the standing
  corpus; only the delta is tokenized fresh, and in a real
  deployment the corpus side's sorted sets + prefix index are a
  maintained table, not a recomputation).

Scale notes: the global token order is a broadcast-joinable frequency
table (no global rank window); candidates are verified ROW-LOCALLY by
``array_intersect`` on carried token arrays (no explode shuffle
proportional to candidates × set size — measured 36s → 3.7s at sf0.1
vs the count-join verify); with threshold t, alpha arithmetic stays
in exact integers for t = 0.5 (alpha = (na+nb+2) div 3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sorted_token_sets(
    tok: DataFrame, freq: DataFrame, t: float
) -> DataFrame:
    """(id, w) distinct tokens + (w, f) global frequencies →
    (id, sw sorted-rare-first array, n, plen prefix length)."""
    return (
        tok.join(freq, "w")
        .groupBy("doc_id")
        .agg(
            F.expr(
                "transform(sort_array(collect_list(struct(f, w))), s -> s.w)"
            ).alias("sw"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .withColumn(
            "plen",
            (F.col("n") - F.ceil(F.lit(t) * F.col("n")) + 1).cast("int"),
        )
    )


def _prefix(sets: DataFrame) -> DataFrame:
    return sets.select(
        "doc_id",
        "n",
        F.posexplode(F.slice("sw", 1, F.col("plen"))).alias("p", "w"),
    ).withColumn("p", F.col("p") + 1)


def _alpha(na: Column, nb: Column, t: float) -> Column:
    if t == 0.5:  # exact integer form, no float boundary risk
        return F.floor((na + nb + 2) / 3).cast("long")
    return F.ceil(F.lit(t / (1.0 + t)) * (na + nb)).cast("long")


def _verify(cand: DataFrame, sets_a: DataFrame, sets_b: DataFrame, t: float) -> DataFrame:
    inter = (
        cand.join(
            sets_a.select(
                F.col("doc_id").alias("doc_a"),
                F.col("sw").alias("sa"),
                F.col("n").alias("na"),
            ),
            "doc_a",
        )
        .join(
            sets_b.select(
                F.col("doc_id").alias("doc_b"),
                F.col("sw").alias("sb"),
                F.col("n").alias("nb"),
            ),
            "doc_b",
        )
        .withColumn("i", F.size(F.array_intersect("sa", "sb")).cast("long"))
    )
    jac = F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))
    return inter.filter(jac >= t).select("doc_a", "doc_b", jac.alias("jac"))


def jaccard_self_join(tok: DataFrame, t: float) -> DataFrame:
    """All (a < b) pairs in one (doc_id, w) collection with
    Jaccard >= t. Exact."""
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    sets = sorted_token_sets(tok, freq, t)
    prefix = _prefix(sets)
    pa = prefix.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n").alias("na"),
        F.col("p").alias("pa"),
        "w",
    )
    pb = prefix.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n").alias("nb"),
        F.col("p").alias("pb"),
        "w",
    )
    ubound = (
        F.least(F.col("na") - F.col("pa"), F.col("nb") - F.col("pb")) + 1
    )
    cand = (
        pa.join(pb, "w")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(F.col("nb") >= F.lit(t) * F.col("na"))
        .filter(F.col("na") >= F.lit(t) * F.col("nb"))
        .filter(ubound >= _alpha(F.col("na"), F.col("nb"), t))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _verify(cand, sets, sets, t)


def jaccard_rs_join(
    probe_tok: DataFrame, index_tok: DataFrame, t: float
) -> DataFrame:
    """All (probe doc_a, index doc_b) pairs with Jaccard >= t — the
    incremental delta-vs-corpus shape. The GLOBAL token order comes
    from the INDEX side's frequencies (the standing corpus statistics
    a production index maintains; order choice affects pruning only,
    never correctness — unseen probe tokens sort rare-first at f=0,
    which is exactly where they prune best)."""
    freq = index_tok.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    # probe tokens absent from the index get f=0 (rarest): they can
    # never contribute to overlap, but must still occupy prefix slots
    probe_freq = (
        probe_tok.select("w")
        .distinct()
        .join(freq, "w", "left")
        .select("w", F.coalesce("f", F.lit(0)).alias("f"))
    )
    sets_p = sorted_token_sets(probe_tok, probe_freq, t)
    sets_i = sorted_token_sets(index_tok, freq, t)
    pa = _prefix(sets_p).select(
        F.col("doc_id").alias("doc_a"),
        F.col("n").alias("na"),
        F.col("p").alias("pa"),
        "w",
    )
    pb = _prefix(sets_i).select(
        F.col("doc_id").alias("doc_b"),
        F.col("n").alias("nb"),
        F.col("p").alias("pb"),
        "w",
    )
    ubound = (
        F.least(F.col("na") - F.col("pa"), F.col("nb") - F.col("pb")) + 1
    )
    cand = (
        pa.join(pb, "w")
        .filter(F.col("nb") >= F.lit(t) * F.col("na"))
        .filter(F.col("na") >= F.lit(t) * F.col("nb"))
        .filter(ubound >= _alpha(F.col("na"), F.col("nb"), t))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _verify(cand, sets_p, sets_i, t)
