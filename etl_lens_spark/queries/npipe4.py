"""Training-data pipeline tranche 4: incremental (delta-vs-corpus)
dedup and deterministic epoch shuffle/sharding.

The nightly reality of a 100 TB corpus is not "dedup the world" —
it's "dedup TODAY'S crawl against the world". And the consumer of the
corpus needs a reproducible global permutation (epoch shuffle) that no
engine's nondeterministic RNG can provide. Both land here as declared,
oracle-checked queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_lens_spark.dedup.exact import fingerprint
from etl_lens_spark.queries import query
from etl_lens_spark.sources.tables import load_table

_FP_SQL = "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"


@query(
    "dedup_incremental_batch",
    oracle=f"""
    WITH fps AS (
        SELECT doc_id, {_FP_SQL} AS fp FROM documents
    ),
    corpus AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 10 < 8),
    delta AS (SELECT doc_id, fp FROM fps WHERE doc_id % 10 >= 8),
    firsts AS (SELECT fp, MIN(doc_id) AS keep_id FROM delta GROUP BY fp)
    SELECT d.doc_id, d.fp,
           CASE WHEN c.fp IS NOT NULL THEN 'dup_of_corpus'
                WHEN d.doc_id = f.keep_id THEN 'new'
                ELSE 'dup_in_batch' END AS status
    FROM delta d
    LEFT JOIN corpus c ON d.fp = c.fp
    JOIN firsts f ON d.fp = f.fp
    ORDER BY d.doc_id
    """,
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: classify a delta batch (doc_id %10 ∈ {8,9})
    against the standing corpus (the other 80%) — ``dup_of_corpus`` /
    ``dup_in_batch`` / ``new`` (the within-batch first-seen winner).

    Scale shape: the corpus side collapses to DISTINCT fingerprints
    BEFORE the join, so the standing 100 TB of text contributes one
    32-byte scalar per distinct document to the exchange (and in the
    real deployment that fingerprint set is a maintained table — the
    nightly cost is the delta scan, not a corpus rescan). The delta's
    within-batch election is a min-window riding the SAME fp shuffle
    as the anti-join probe; document text never leaves its scan.
    """
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "fp", fingerprint(F.col("text"))
    )
    corpus_fp = (
        docs.filter(F.col("doc_id") % 10 < 8).select("fp").distinct()
        .withColumn("in_corpus", F.lit(1))
    )
    delta = docs.filter(F.col("doc_id") % 10 >= 8).select("doc_id", "fp")
    keep = F.min("doc_id").over(Window.partitionBy("fp"))
    return (
        delta.join(corpus_fp, "fp", "left")
        .withColumn("keep_id", keep)
        .select(
            "doc_id",
            "fp",
            F.when(F.col("in_corpus").isNotNull(), "dup_of_corpus")
            .when(F.col("doc_id") == F.col("keep_id"), "new")
            .otherwise("dup_in_batch")
            .alias("status"),
        )
        .orderBy("doc_id")
    )


@query(
    "dataset_shard_shuffle",
    oracle="""
    WITH h AS (
        SELECT doc_id, n_chars,
               ('0x' || substring(md5('ep1' || CAST(doc_id AS VARCHAR)),
                                  1, 8))::BIGINT AS hk
        FROM documents
    ),
    pos AS (
        SELECT doc_id, n_chars, hk, hk % 16 AS shard,
               ROW_NUMBER() OVER (PARTITION BY hk % 16
                                  ORDER BY hk, doc_id) AS rn
        FROM h
    )
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars_total,
           CAST(SUM(rn * doc_id) AS BIGINT) AS perm_checksum,
           MIN(hk) AS hash_min, MAX(hk) AS hash_max
    FROM pos GROUP BY shard ORDER BY shard
    """,
)
def dataset_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle + sharding: every document gets a
    salt-keyed md5 order key (seed 'ep1' — change the salt, get an
    independent permutation), shard = key % 16, within-shard position
    by (key, doc_id). The per-shard ``perm_checksum`` Σ(position·id)
    pins the ENTIRE permutation order cross-engine — any engine
    disagreement about who sits where fails the hash.

    This is how a trainer gets a reproducible global shuffle of a
    100 TB corpus with no RNG state: the order key is pure per-row
    arithmetic at scan time (no global sort — shard assignment is a
    hash partition, within-shard order is a per-shard sort that rides
    the one shard shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    hk = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit("ep1"), F.col("doc_id").cast("string")).cast(
                    "binary"
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    pos = docs.select("doc_id", "n_chars", hk.alias("hk")).withColumn(
        "shard", F.col("hk") % 16
    )
    w = Window.partitionBy("shard").orderBy("hk", "doc_id")
    ranked = pos.withColumn("rn", F.row_number().over(w).cast("long"))
    return (
        ranked.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars_total"),
            F.sum(F.col("rn") * F.col("doc_id"))
            .cast("long")
            .alias("perm_checksum"),
            F.min("hk").alias("hash_min"),
            F.max("hk").alias("hash_max"),
        )
        .orderBy("shard")
    )
