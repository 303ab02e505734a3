"""Exact and fingerprint-based deduplication.

Training-data pipelines dedup at 100 TB by hashing, never by comparing
raw text across the cluster: a 128-bit fingerprint column reduces the
shuffle payload from document size to 32 hex chars, and grouping on
the fingerprint is a single hash shuffle that AQE will coalesce.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def normalized_text(col: Column) -> Column:
    """Canonical form for duplicate detection: lowercase, collapsed
    whitespace, trimmed. Cheap, JVM-side, deterministic."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def fingerprint(col: Column) -> Column:
    """128-bit content fingerprint (md5 of the normalized text).
    md5 is the right choice here: available in every engine (so
    results are portable/auditable), collision-safe at any corpus
    size that fits in a datacenter."""
    return F.md5(normalized_text(col))


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the lowest-id representative of each exact-duplicate group.

    Deterministic (min id, id unique), distributed, and ONE shuffle
    with no join back: ``min_by`` over the whole row struct keyed by
    id. Because min_by is an algebraic aggregate, the map-side partial
    keeps a single representative per (partition, fingerprint) — on a
    clone-heavy corpus the shuffle carries one row per distinct text
    per partition, not the full corpus, and a pathological
    million-copy fingerprint still reduces map-side. (The earlier
    groupBy-then-join-back form scanned and shuffled the text twice.)
    """
    cols = df.columns
    return (
        df.withColumn("__fp", fingerprint(F.col(text_col)))
        .groupBy("__fp")
        .agg(F.min_by(F.struct(*cols), F.col(id_col)).alias("__row"))
        .select(*[F.col(f"__row.{c}").alias(c) for c in cols])
    )


def fingerprint_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Duplicate-group summary keyed by fingerprint: representative id,
    copy count. The groupBy form (vs window row_number) is preferred at
    scale — partial aggregation beats materializing per-row ranks."""
    return (
        df.withColumn("fp", fingerprint(F.col(text_col)))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )
