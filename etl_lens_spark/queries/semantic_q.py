"""Semantic clustering + semantic dedup (SemDeDup) over embeddings.

The [N] embedding-dedup family so far covers exact cosine pairs
(quadratic anchor), SRP-LSH blocking, and CC clustering. This module
adds the third standard production shape: *cluster first, dedup
within clusters* (SemDeDup, Abbas et al. 2023, arXiv:2303.09540 —
public paper). k-means partitions the corpus into k buckets; the
quadratic cosine sweep then runs per-bucket, so total pair work drops
from O(n²) to O(k · (n/k)²) = O(n²/k), and each bucket's sweep is an
independent, perfectly parallel task. At 100 TB with k ~ 100k
clusters this is the difference between impossible and routine.

Every query here is oracle-checked: the DuckDB twin unrolls the same
Lloyd iterations from the same deterministic init with the same
6-decimal centroid rounding (see similarity/kmeans.py), so both
engines walk identical centroid states and the integer cluster
assignments hash-match exactly.

Reference parity: no clustering exists in the reference (analytics
stop at the catalog GROUP BY, src/main.cpp:255-321) — this is
driver-mandated north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_lens_spark.operators.partitioning import parallelize_compute
from etl_lens_spark.queries import query
from etl_lens_spark.similarity.kmeans import kmeans_assign, kmeans_oracle_sql
from etl_lens_spark.sources.tables import load_table
from etl_lens_spark.operators.staging import stage

K = 8
ITERS = 3
SEM_TAU = 0.35  # same fixture-calibrated near-dup threshold as graph_q

_KM = kmeans_oracle_sql(k=K, iters=ITERS)


@query(
    "semantic_kmeans_clusters",
    oracle=f"""
    {_KM}
    SELECT id AS vec_id, CAST(cluster AS INTEGER) AS cluster
    FROM assign{ITERS}
    ORDER BY vec_id
    """,
)
def semantic_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[N] distributed k-means assignment (k=8, 3 Lloyd passes,
    lowest-id init). Assignment is a row-local argmin over broadcast
    centroid literals (no shuffle); the centroid update's exchange is
    O(partitions · k · dim) after map-side combine — row-count
    independent, the MLlib treeAggregate shape."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        kmeans_assign(e, k=K, iters=ITERS)
        .select("vec_id", F.col("cluster").cast("int").alias("cluster"))
        .orderBy("vec_id")
    )


@query(
    "semantic_cluster_purity",
    oracle=f"""
    {_KM}
    , lab AS (
        SELECT a.cluster, e.label, COUNT(*) AS n
        FROM assign{ITERS} a JOIN embeddings e ON a.id = e.vec_id
        GROUP BY a.cluster, e.label
    ),
    tot AS (
        SELECT cluster, CAST(SUM(n) AS BIGINT) AS cluster_size,
               MAX(n) AS max_n
        FROM lab GROUP BY cluster
    )
    SELECT CAST(l.cluster AS INTEGER) AS cluster, l.label,
           CAST(l.n AS BIGINT) AS n, t.cluster_size,
           CAST(l.n AS DOUBLE) / t.cluster_size AS label_frac
    FROM lab l JOIN tot t ON l.cluster = t.cluster
    ORDER BY cluster, label
    """,
)
def semantic_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-quality diagnostic: cross-tab of learned cluster ×
    ground-truth label with per-cluster size and label fraction —
    the evaluation table a curation run reviews before trusting the
    clustering for SemDeDup. One small agg over the assignment."""
    e = load_table(spark, sf_dir, "embeddings")
    a = kmeans_assign(e, k=K, iters=ITERS)
    lab = (
        a.join(e.select("vec_id", "label"), "vec_id")
        .groupBy("cluster", "label")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w = Window.partitionBy("cluster")
    return (
        lab.withColumn("cluster_size", F.sum("n").over(w).cast("long"))
        .select(
            F.col("cluster").cast("int").alias("cluster"),
            "label",
            "n",
            "cluster_size",
            (F.col("n").cast("double") / F.col("cluster_size")).alias(
                "label_frac"
            ),
        )
        .orderBy("cluster", "label")
    )


@query(
    "dedup_semantic_semdedup",
    headline=True,
    oracle=f"""
    {_KM}
    , v AS (
        SELECT a.id, a.cluster, b.v
        FROM assign{ITERS} a JOIN base b ON a.id = b.id
    ),
    dup AS (
        SELECT DISTINCT hi.id
        FROM v lo JOIN v hi
          ON lo.cluster = hi.cluster AND lo.id < hi.id
        WHERE list_cosine_similarity(lo.v, hi.v) >= {SEM_TAU}
    )
    SELECT v.id AS vec_id, CAST(v.cluster AS INTEGER) AS cluster,
           (dup.id IS NULL) AS keep
    FROM v LEFT JOIN dup ON v.id = dup.id
    ORDER BY vec_id
    """,
)
def dedup_semantic_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[N] SemDeDup: k-means-cluster the embeddings, then drop any
    vector with a LOWER-id near-duplicate (cosine >= tau) in the SAME
    cluster. The pair sweep joins on the cluster key, so each task
    scores one cluster's (n/k)² pairs instead of the corpus's n² —
    the published SemDeDup recipe, and the reason this plan scales
    where dedup_embedding_cosine (the exact anchor) cannot.

    The pair sweep is ``applyInPandas`` per cluster: each task pulls
    ONE cluster, unit-normalizes its vectors, and takes the dense
    Gram matrix with numpy — the published SemDeDup computation
    verbatim (they run it per-cluster on GPUs; BLAS per-executor here).
    Measured ~5x over the pair-join + interpreted-fold form at sf0.1.
    At 100 TB the operator's contract is that k is sized so a cluster
    fits one task (k ≈ n / 10⁴ in the paper); the groupBy shuffles
    each vector exactly once, on a key k-means has made low-skew."""
    import numpy as np
    import pandas as pd

    e = parallelize_compute(load_table(spark, sf_dir, "embeddings"))
    a = kmeans_assign(e, k=K, iters=ITERS)
    v = e.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).join(a, "vec_id")
    # (vec_id, v, cluster) feeds BOTH the per-cluster pair sweep and
    # the final keep-join — materialize the assignment once instead of
    # running the argmin pandas_udf over the corpus twice (guide §5;
    # this is the corpus projected to the vectors, the natural
    # intermediate a real deployment would persist between the
    # clustering and sweep phases)
    v = stage(v, "semdedup_vectors")

    tau = SEM_TAU
    # degenerate-cluster guard: SemDeDup's quadratic term is bounded
    # by the LARGEST cluster, and a pathological corpus (near-
    # identical embeddings) can collapse into one giant cluster. The
    # published fix is raising k until clusters fit a task; this
    # operator fails fast with that instruction instead of silently
    # materializing an n_c² Gram matrix (same discipline as
    # dedup/embedding.py::cosine_pairs' max_rows guard).
    max_cluster = 200_000

    def find_dups(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_cluster:
            raise ValueError(
                f"cluster of {len(pdf)} rows exceeds max_cluster="
                f"{max_cluster}; raise k so each k-means cluster fits "
                f"one task (SemDeDup sizes k ~ n / 10^4)"
            )
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        M = np.array(pdf["v"].tolist(), dtype=np.float64)[order]
        M = M / np.linalg.norm(M, axis=1, keepdims=True)
        gram = M @ M.T
        iu = np.triu_indices(len(ids), 1)
        dup = np.unique(iu[1][gram[iu] >= tau])  # j of any (i<j) hit
        return pd.DataFrame({"vec_id": ids[dup]})

    dup = v.groupBy("cluster").applyInPandas(
        find_dups, "vec_id long"
    ).withColumn("is_dup", F.lit(1))
    keep = v.join(dup, "vec_id", "left").select(
        "vec_id",
        F.col("cluster").cast("int").alias("cluster"),
        F.col("is_dup").isNull().alias("keep"),
    )
    # materialize before the global sort: the range exchange's
    # sampling pass otherwise re-executes the per-cluster Gram sweep
    # (FlatMapGroupsInPandas) a second time
    return stage(keep, "semdedup_keep").orderBy("vec_id")
