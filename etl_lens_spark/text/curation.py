"""Incrementally-maintained corpus curation — the algebra that turns
the curated training corpus itself into a maintained lake table.

Rounds 9-11 made every retrieval INDEX a maintained table; this
module does the same for the CURATION output: the (quality-gated,
exact-deduped) corpus a training run actually consumes. The data
model is two member rels of ONE multi-table lake log, committed
atomically per epoch (the warehouse_ivm_restartable_topk discipline
— a view plus its supporting state must never be torn):

- **support/**: ``(fp, doc_id, n_tokens)`` for EVERY head document
  that passes the quality gate — duplicates included. This is the
  refcounted-support analog for argmin: without it, deleting a
  keeper could not PROMOTE the next-smallest surviving duplicate
  without re-scanning the corpus.
- **curated/**: ``(fp, doc_id, n_tokens)`` — exactly one row per
  fingerprint, the min-doc_id keeper (dedup/exact.exact_dedup's
  deterministic rule). This member IS the curated corpus manifest.

Maintenance rules (each a pure function of (delta, current state) —
the IVM delta-rule discipline of operators/ivm.py):

- insert batch: gate the DELTA alone (O(delta)); new fingerprints
  elect their in-delta min as keeper; a delta doc with a SMALLER id
  than the standing keeper replaces it (delete+insert of the
  curated row); everything else lands in support only.
- delete batch: departing ids leave support by anti-join; curated
  rows whose keeper id departed are removed and their fingerprints
  re-elect from the SURVIVING support rows of just those
  fingerprints (pruned before any shuffle) — keeper PROMOTION,
  the case a naive "maintained distinct" silently gets wrong.

Scale shape: the gate is JVM-side expressions over the delta; the
election is one groupBy(fp) with an algebraic min_by (map-side
partial — a million-copy fingerprint still reduces map-side);
promotion touches only affected fingerprints' support rows; the
per-epoch physical rewrite is the same anti-join rewrite discipline
as lakelog.rewrite_minus_ids (shardable by fp bucket at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_lens_spark.dedup.exact import fingerprint

GATE_MIN_TOKENS = 25
GATE_MAX_TOKENS = 5000
GATE_MIN_UNIQ = 0.35


def gate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = GATE_MIN_TOKENS,
    max_tokens: int = GATE_MAX_TOKENS,
    min_uniq: float = GATE_MIN_UNIQ,
) -> DataFrame:
    """Quality-gated support rows ``(fp, doc_id, n_tokens)`` for a
    batch of documents. The gate is deterministic, text-only (so
    exact duplicates always agree on it — the property that keeps
    the keeper rule total), and cross-engine reproducible: token
    count on the raw whitespace split, distinct-token ratio on the
    lowercased split."""
    toks = F.split(F.col(text_col), " ")
    uniq = F.size(F.array_distinct(F.split(F.lower(F.col(text_col)), " ")))
    return (
        docs.select(
            fingerprint(F.col(text_col)).alias("fp"),
            F.col(id_col).alias("doc_id"),
            F.size(toks).cast("long").alias("n_tokens"),
            (uniq / F.size(toks)).alias("__uniq_ratio"),
        )
        .filter(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("n_tokens") <= max_tokens)
            & (F.col("__uniq_ratio") >= min_uniq)
        )
        .drop("__uniq_ratio")
    )


def elect_keepers(support: DataFrame) -> DataFrame:
    """One curated row per fingerprint: the min-doc_id keeper. ONE
    shuffle, algebraic min_by (map-side partial keeps a single
    candidate per (partition, fp))."""
    return (
        support.groupBy("fp")
        .agg(
            F.min_by(
                F.struct("doc_id", "n_tokens"), F.col("doc_id")
            ).alias("k")
        )
        .select(
            "fp",
            F.col("k.doc_id").alias("doc_id"),
            F.col("k.n_tokens").alias("n_tokens"),
        )
    )


def insert_deltas(
    delta_support: DataFrame, curated: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """(adds, replaced) curated-member deltas for a gated insert
    batch: adds = new fingerprints' in-delta keepers PLUS smaller-id
    replacements; replaced = the standing keeper rows those
    replacements evict. O(delta) probe: the delta's per-fp minima
    join the curated member on fp."""
    dmin = elect_keepers(delta_support)
    j = dmin.alias("d").join(
        curated.select(
            "fp", F.col("doc_id").alias("__cur_id")
        ).alias("c"),
        "fp",
        "left",
    )
    adds = j.filter(
        F.col("__cur_id").isNull()
        | (F.col("d.doc_id") < F.col("__cur_id"))
    ).select("fp", F.col("d.doc_id").alias("doc_id"), "n_tokens")
    replaced = j.filter(
        F.col("__cur_id").isNotNull()
        & (F.col("d.doc_id") < F.col("__cur_id"))
    ).select("fp", F.col("__cur_id").alias("doc_id"))
    return adds, replaced


def delete_deltas(
    support_after: DataFrame, curated: DataFrame, gone: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """(removed, promoted) curated-member deltas for a delete batch:
    removed = curated rows whose keeper id departed; promoted = the
    re-elected min-id keepers from the SURVIVING support rows of
    exactly those fingerprints (empty for a fingerprint whose last
    copy left). ``gone`` is a one-column ``__gone`` id frame;
    ``support_after`` must already exclude the departed rows."""
    removed = curated.join(
        F.broadcast(gone),
        curated["doc_id"] == gone["__gone"],
        "left_semi",
    )
    affected = removed.select("fp")
    promoted = elect_keepers(
        support_after.join(F.broadcast(affected), "fp", "left_semi")
    )
    return removed, promoted
