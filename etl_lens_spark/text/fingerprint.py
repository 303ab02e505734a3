"""Document fingerprinting: winnowing over k-gram rolling hashes
(Schleimer, Wilkerson, Aiken — "Winnowing: Local Algorithms for
Document Fingerprinting", SIGMOD 2003). [N] north-star surface:
the content-overlap detector that complements MinHash (set
similarity) with LOCALITY — shared fingerprints pinpoint shared
substrings, which is what plagiarism/near-dup forensics and
contamination checks want.

Pipeline (all JVM expressions — zero Python on the per-doc path):

1. normalize: lowercase, strip non-alphanumerics;
2. k-gram hashes: polynomial hash with literal base powers
   (``sum(ascii(c_j) * B^(k-1-j)) mod M``) — deliberately NOT
   xxhash/murmur so a DuckDB oracle can compute the identical value
   with the identical arithmetic;
3. winnow: sliding min over every window of ``w`` consecutive gram
   hashes (window function, ROWS frame), keep distinct mins per doc —
   the fingerprint set;
4. candidates: inverted-index self-join on fingerprint value, pairs
   sharing >= ``min_shared`` fingerprints — an equi-join on a
   well-distributed key, never an all-pairs scan (the same blocked
   shape as the MinHash band join).

Scale: per-doc work is linear in length; the explode is (doc ×
gram-position) rows but carries only (id, pos, hash) — the text
itself never shuffles. The candidate join is bucketed by fingerprint
value; a frequency cap (``max_bucket``) drops degenerate fingerprints
(boilerplate) exactly like the LSH band-bucket guard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_BASE = 257
HASH_MOD = 1_000_000_007


def _normalize(text: Column) -> Column:
    return F.regexp_replace(F.lower(text), "[^a-z0-9]", "")


def gram_hash_expr(norm: Column, pos: Column, k: int) -> Column:
    """Polynomial hash of the k-gram starting at 1-indexed ``pos``:
    sum(ascii(char_j) * B^(k-1-j)) mod M, with the base powers as
    exact integer literals (kept < 2^53 so the identical arithmetic
    is exact in any engine)."""
    terms = [
        F.ascii(F.substr(norm, pos + j, F.lit(1)))
        * F.lit(HASH_BASE ** (k - 1 - j))
        for j in range(k)
    ]
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return (total % F.lit(HASH_MOD)).cast("long")


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distinct winnowed fingerprints per document: (id_col, fp).

    Guarantee (the winnowing theorem): any shared substring of length
    >= k + w - 1 between two documents yields at least one shared
    fingerprint.
    """
    norm = _normalize(F.col(text_col))
    d = docs.select(F.col(id_col), norm.alias("__norm")).filter(
        F.length("__norm") >= k + w - 1
    )
    grams = d.select(
        id_col,
        F.explode(
            F.sequence(F.lit(1), F.length("__norm") - (k - 1))
        ).alias("p"),
        F.col("__norm"),
    ).select(
        id_col,
        "p",
        gram_hash_expr(F.col("__norm"), F.col("p"), k).alias("gh"),
    )
    win = Window.partitionBy(id_col).orderBy("p").rowsBetween(-(w - 1), 0)
    return (
        grams.withColumn("fp", F.min("gh").over(win))
        .filter(F.col("p") >= w)  # full windows only
        .select(id_col, "fp")
        .distinct()
    )


def fingerprint_candidates(
    fps: DataFrame,
    min_shared: int = 2,
    id_col: str = "doc_id",
    max_bucket: int = 200,
) -> DataFrame:
    """Candidate pairs (id_a < id_b, n_shared) sharing >= min_shared
    fingerprints — inverted-index equi-join on fp. Fingerprints
    appearing in more than ``max_bucket`` docs are dropped first
    (boilerplate guard: they contribute O(bucket²) pairs and no
    signal, the same failure mode as a hot LSH band)."""
    freq = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("__n"))
    pruned = fps.join(
        F.broadcast(freq.filter(F.col("__n") <= max_bucket).select("fp")),
        "fp",
    )
    a = pruned.select(F.col("fp"), F.col(id_col).alias("id_a"))
    b = pruned.select(F.col("fp"), F.col(id_col).alias("id_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
