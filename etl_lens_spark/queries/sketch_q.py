"""Mergeable distinct-count structures beyond HLL: an ORACLE-EXACT
KMV bottom-k sketch and exact roaring-style bitmap aggregation.

Both close the same 100 TB gap as ``sketch_hll_mergeable`` — daily
pre-aggregates that merge into any rollup without rescanning the
fact table — but with two properties HLL can't give:

- KMV is built from md5 (identical in Spark and DuckDB), so the
  DuckDB oracle recomputes the sketch AND its estimate bit-for-bit —
  the first sketch in the registry whose *estimate* is hash-checked,
  not just error-bounded in tests.
- The bitmap form is EXACT (Spark 4 ``bitmap_construct_agg`` /
  ``bitmap_or_agg``): per-(day, bucket) segment bitmaps OR-merge into
  per-type exact distinct counts — the Databricks/ClickHouse
  "bitmap rollup" pattern, checked against plain COUNT(DISTINCT).

Reference parity: the reference's catalog is one exact in-memory
hash map per event type (`src/main.cpp:152,255-321`); these are its
two scale-out replacements (approximate-mergeable and exact-
mergeable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_lens_spark.operators import kmv
from etl_lens_spark.queries import query
from etl_lens_spark.sources.tables import load_table

_KMV_K = 64

# DuckDB replica of operators/kmv.kmv_value: first 13 hex chars of
# md5 folded to a BIGINT (52 bits — exact in a double both engines).
_KMV_V_SQL = """
    list_reduce(list_transform(range(1, 14),
      i -> CAST(strpos('0123456789abcdef',
             substr(md5(CAST(user_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)),
      (a, b) -> a * 16 + b)
"""


@query(
    "sketch_kmv_distinct_merge",
    oracle=f"""
    WITH hv AS (
      SELECT DISTINCT event_type, {_KMV_V_SQL} AS v
      FROM events WHERE user_id IS NOT NULL
    ),
    ranked AS (
      SELECT event_type, v,
             row_number() OVER (PARTITION BY event_type ORDER BY v) AS r
      FROM hv
    ),
    sk AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_sk,
             MAX(CASE WHEN r = {_KMV_K} THEN v END) AS kth
      FROM ranked WHERE r <= {_KMV_K} GROUP BY event_type
    ),
    ex AS (
      SELECT event_type,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
             CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT)
               AS n_days_merged
      FROM events WHERE user_id IS NOT NULL GROUP BY event_type
    )
    SELECT s.event_type,
           e.n_days_merged,
           CASE WHEN s.n_sk < {_KMV_K} THEN CAST(s.n_sk AS DOUBLE)
                ELSE {float(_KMV_K - 1)} /
                     (CAST(s.kth AS DOUBLE) / 4503599627370496.0)
           END AS est_users,
           e.exact_users
    FROM sk s JOIN ex e USING (event_type)
    ORDER BY event_type
    """,
)
def sketch_kmv_distinct_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day KMV sketches of distinct users MERGED into per-type
    estimates (operators/kmv.py) — and the merge itself is what the
    oracle verifies: the Spark side builds bottom-64 sketches per
    (event_type, day) and merges them (k smallest of the union),
    while the oracle computes the bottom-64 of the WHOLE type
    directly. They hash-match only because KMV merge is lossless —
    every one of the global k minima is inside its own day's k
    minima — so the cross-engine check proves the mergeability
    property, not just the arithmetic.

    Scale posture: hashing is row-local; the day-level dedup + rank
    partitions on (event_type, day) — bounded state, no global sort;
    the merge ranks at most 64·n_days rows per type. The exact
    column is the one COUNT(DISTINCT) pass the sketch replaces at
    100 TB (kept here as the demonstration anchor)."""
    from etl_lens_spark.config import kmv_k

    k = kmv_k(spark)  # spark.etl_lens.kmv.k; default 64 = the oracle
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select(
            "event_type",
            F.to_date("ts").alias("day"),
            kmv.kmv_value(F.col("user_id")).alias("v"),
            "user_id",
        )
    )
    day_sk = kmv.kmv_topk(ev, ["event_type", "day"], k)
    merged = kmv.kmv_topk(day_sk, ["event_type"], k)
    est = kmv.kmv_estimate(merged, ["event_type"], k)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_users"),
        F.countDistinct("day").cast("long").alias("n_days_merged"),
    )
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            "n_days_merged",
            F.col("est").alias("est_users"),
            "exact_users",
        )
        .orderBy("event_type")
    )


@query(
    "sketch_bitmap_exact_distinct",
    oracle="""
    WITH seg AS (
      SELECT event_type,
             CAST(ts AS DATE) AS day,
             CASE WHEN user_id <= 0 THEN 0
                  ELSE (user_id - 1) // 32768 + 1 END AS bucket,
             user_id
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(DISTINCT (day, bucket)) AS BIGINT)
             AS n_segment_bitmaps,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM seg
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def sketch_bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counts via bitmap aggregation: one
    bitmap per (event_type, day, 32k-bucket) segment
    (``bitmap_construct_agg``), OR-merged across days per
    (event_type, bucket) (``bitmap_or_agg``), summed bucket
    cardinalities = exact distinct users. The oracle recomputes both
    the user count (plain COUNT(DISTINCT)) and the segment-bitmap
    count (replicating Spark's bucket function ``(v-1) div 32768 + 1``
    for positive v, 0-bucket for v ≤ 0 — probed, not assumed), so a
    silent change in the bucket layout fails the hash.

    This is the ClickHouse/Databricks bitmap-rollup pattern: at
    100 TB the per-day segment bitmaps are the stored pre-aggregate
    (tiny — 4 KiB per 32k id range) and ANY slice's exact distinct
    count is an OR + popcount over them, never a rescan. All
    map-side-combining aggregates on well-distributed keys; dense
    ids are the contract (the fixture's user_id is a dense BIGINT),
    sparse domains fall back to the KMV/HLL sketches."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.expr("bitmap_bucket_number(user_id)").alias("bucket"),
        F.expr("bitmap_bit_position(user_id)").alias("pos"),
    )
    seg = ev.groupBy("event_type", "day", "bucket").agg(
        F.expr("bitmap_construct_agg(pos)").alias("bm")
    )
    merged = seg.groupBy("event_type", "bucket").agg(
        F.expr("bitmap_or_agg(bm)").alias("bm"),
        F.count(F.lit(1)).cast("long").alias("n_seg"),
    )
    return (
        merged.groupBy("event_type")
        .agg(
            F.sum("n_seg").cast("long").alias("n_segment_bitmaps"),
            F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("n_users"),
        )
        .orderBy("event_type")
    )
