"""IVF (inverted-file) approximate nearest neighbor — the coarse-
quantizer counterpart to the SRP-LSH plan in similarity/knn.py.

Plan: (1) train k centroids (deterministic seed sample + a few Lloyd
iterations, all distributed — assignment via a vectorized Pandas UDF
doing one numpy matmul per Arrow batch, means via groupBy); (2) assign
every corpus vector to its nearest centroid (its *cell*); (3) at query
time, probe the ``nprobe`` nearest cells per query and rescore
exact-cosine only within those cells.

Scale posture: centroids are tiny (k × dim floats) and ride to
executors as broadcast state inside the UDF closure; the corpus is
shuffled ONCE on cell id (and at 100 TB you'd persist it bucketed by
cell, making repeated query batches shuffle-free); per-query work
drops from O(n) to O(n·nprobe/k) expected. Recall/latency tunes with
(k, nprobe) exactly like FAISS IVF-Flat.

[N] north-star surface (SURVEY §2.3); no reference counterpart.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_lens_spark.similarity.knn import _as_double, dot, norm


def _normalized_matrix(series: pd.Series) -> np.ndarray:
    m = np.asarray(series.tolist(), dtype=np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _partial_cell_sums(
    emb: DataFrame, centroids: np.ndarray, vec_col: str
) -> DataFrame:
    """One Lloyd assignment pass emitting PER-PARTITION partial sums:
    each partition reduces its vectors to a k × dim accumulator and
    emits (cell, dim_i, s, n) rows — O(partitions · k · dim) rows into
    the downstream shuffle instead of O(corpus · dim) (the posexplode
    plan the round-1 verdict flagged as the dominant IVF-build cost at
    100 TB)."""
    cent = centroids  # captured; broadcast by closure serialization
    k, dim = cent.shape

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((k, dim), dtype=np.float64)
        cnt = np.zeros(k, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            raw = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            cells = np.argmax(_normalized_matrix(pdf[vec_col]) @ cent.T, axis=1)
            np.add.at(acc, cells, raw)  # means over RAW vectors
            cnt += np.bincount(cells, minlength=k)
        nz = np.nonzero(cnt)[0]
        yield pd.DataFrame(
            {
                "cell": np.repeat(nz, dim).astype(np.int32),
                "dim_i": np.tile(np.arange(dim, dtype=np.int32), len(nz)),
                "s": acc[nz].ravel(),
                "n": np.repeat(cnt[nz], dim),
            }
        )

    return emb.select(vec_col).mapInPandas(
        part, "cell int, dim_i int, s double, n long"
    )


def train_centroids(
    emb: DataFrame,
    k: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Lloyd's k-means on the unit sphere (spherical k-means).

    Init is the k smallest ids (deterministic); each iteration runs one
    distributed assignment+partial-sum pass (numpy matmul per Arrow
    batch, k × dim accumulator per partition) and reduces the partials
    with a groupBy over O(partitions · k · dim) tiny rows — only the
    k × dim centroid matrix ever returns to the driver, and the corpus
    itself never shuffles during training.
    """
    init = (
        emb.orderBy(id_col)
        .limit(k)
        .select(vec_col)
        .toPandas()[vec_col]
    )
    centroids = _normalized_matrix(init)
    for _ in range(iters):
        # ONE definition of the Lloyd step (refine_centroids), shared
        # with the maintained-index staleness dial so training and
        # re-train candidates cannot diverge (round-10 review fix)
        centroids = refine_centroids(emb, centroids, vec_col)
    return centroids


def assign_cells(
    emb: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """Add a ``cell`` column (nearest centroid id by cosine); with
    nprobe > 1, emit one row per probed cell (query-side fan-out).
    One numpy matmul per Arrow batch — the vectorized scale path."""
    cent = centroids  # captured; broadcast by closure serialization

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = _normalized_matrix(pdf[vec_col])
            sims = m @ cent.T  # (rows, k)
            if nprobe == 1:
                out = pdf.copy()
                out["cell"] = np.argmax(sims, axis=1).astype(np.int32)
                yield out
            else:
                top = np.argsort(-sims, axis=1)[:, :nprobe]
                rep = pdf.loc[pdf.index.repeat(nprobe)].reset_index(drop=True)
                rep["cell"] = top.ravel().astype(np.int32)
                yield rep

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in emb.schema.fields
    )
    return emb.mapInPandas(probe, schema + ", cell int")


def ivf_probe_topk(
    cell_index: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
) -> DataFrame:
    """The probe/rescore half of ivf_topk, factored so a MAINTAINED
    cell-index table (id, vector, cell — e.g. a lake table kept
    current from a CDF, sim_ann_incremental_cdf) serves queries
    WITHOUT reassigning the corpus: queries fan out to their nprobe
    nearest cells, the join is a hash equi-join on ``cell`` (query
    side broadcast; with the index table bucketed by cell the corpus
    side is shuffle-free), exact cosine within probed cells only.
    One definition shared by the build-once path (ivf_topk) and the
    incremental path, so the two cannot score differently."""
    from pyspark.sql import Window

    c = cell_index.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("__cvec"),
        "cell",
    ).withColumn("__cnorm", norm(F.col("__cvec")))
    q = assign_cells(
        queries, centroids, id_col, vec_col, nprobe=nprobe
    ).select(
        F.col(id_col).alias(query_id_col),
        _as_double(F.col(vec_col)).alias("__qvec"),
        "cell",
    ).withColumn("__qnorm", norm(F.col("__qvec")))
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .withColumn(
            "cos_sim",
            dot(F.col("__cvec"), F.col("__qvec"))
            / (F.col("__cnorm") * F.col("__qnorm")),
        )
        # a (query, neighbor) pair can meet in several probed cells
        .dropDuplicates([query_id_col, "neighbor_id"])
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank_n", F.row_number().over(w).cast("long"))
        .filter(F.col("rank_n") <= k)
        .select(query_id_col, "neighbor_id", "rank_n", "cos_sim")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    train_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
) -> DataFrame:
    """Approximate top-k: exact cosine, restricted to the nprobe most
    promising cells per query. Join is a hash-partitioned equi-join on
    ``cell`` (corpus side shuffles once; query side is broadcast).
    Build-once composition of train_centroids → assign_cells →
    ivf_probe_topk."""
    centroids = train_centroids(
        corpus, k=n_cells, iters=train_iters, id_col=id_col, vec_col=vec_col
    )
    cell_index = assign_cells(corpus, centroids, id_col, vec_col)
    return ivf_probe_topk(
        cell_index,
        queries,
        centroids,
        k=k,
        nprobe=nprobe,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
    )


def stale_fraction(
    cell_index: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The DRIFT dial of the maintained-index contract: one row
    (n_total, n_stale) counting index vectors whose nearest centroid
    under the GIVEN matrix differs from their stored cell. Between
    re-trains assignments are immutable and centroids fixed, so
    staleness against the SERVING centroids is 0 by construction;
    the operator's re-train trigger evaluates it against CANDIDATE
    centroids (one Lloyd step from the serving matrix over the
    current corpus — ids stay aligned, so the comparison is
    meaningful) and rebuilds when the fraction crosses its
    threshold. One vectorized assignment pass, no shuffle."""
    re = assign_cells(
        cell_index.withColumnRenamed("cell", "cell_stored"),
        centroids,
        id_col,
        vec_col,
    )
    return re.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.coalesce(
            F.sum(
                (F.col("cell") != F.col("cell_stored")).cast("long")
            ),
            F.lit(0).cast("long"),
        ).alias("n_stale"),
    )


def centroids_to_df(spark, centroids: np.ndarray, epoch: int):
    """The centroid matrix as rows ``(cell, dim_i, val, epoch)`` —
    the persistence format that lets the quantizer live as a MEMBER
    REL of the index's own lake table, so one atomic multi-table
    commit swaps (cells, centroids) together and a reader resolving
    any version gets a matched pair (the sim_ann_retrain_swap
    zero-downtime contract). k × dim rows — driver-sized."""
    k, dim = centroids.shape
    rows = [
        (int(c), int(j), float(centroids[c, j]), int(epoch))
        for c in range(k)
        for j in range(dim)
    ]
    return spark.createDataFrame(
        rows, "cell int, dim_i int, val double, epoch int"
    )


def centroids_from_df(cent_df) -> tuple[np.ndarray, int]:
    """Inverse of centroids_to_df: ``(matrix, epoch)`` from the cent
    member rel at one version. RAISES if the rows carry more than
    one epoch — a mixed-epoch centroid read IS a torn index state,
    which the atomic-swap commit makes impossible; raising turns any
    future regression into a loud failure instead of silently
    serving with a Frankenstein quantizer."""
    rows = cent_df.collect()
    epochs = {r["epoch"] for r in rows}
    if len(epochs) != 1:
        raise ValueError(
            f"torn centroid state: epochs {sorted(epochs)} in one "
            "snapshot (the atomic swap contract is broken)"
        )
    k = max(r["cell"] for r in rows) + 1
    dim = max(r["dim_i"] for r in rows) + 1
    m = np.zeros((k, dim), dtype=np.float64)
    for r in rows:
        m[r["cell"], r["dim_i"]] = r["val"]
    return m, epochs.pop()


def refine_centroids(
    emb: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
) -> np.ndarray:
    """One Lloyd step from an EXISTING centroid matrix over the
    current corpus — cell ids keep their identity (each centroid
    moves toward the mean of its current members), which is what
    makes the staleness comparison well-defined. Same distributed
    partial-sums pass as training; only k × dim floats return to the
    driver. A centroid that lost all members keeps its old
    position."""
    k, dim = centroids.shape
    sums = (
        _partial_cell_sums(emb, centroids, vec_col)
        .groupBy("cell", "dim_i")
        .agg(F.sum("s").alias("s"))
        .toPandas()
    )
    new = centroids.copy()
    acc = np.zeros((k, dim), dtype=np.float64)
    acc[sums["cell"].to_numpy(), sums["dim_i"].to_numpy()] = sums[
        "s"
    ].to_numpy()
    norms = np.linalg.norm(acc, axis=1)
    live = norms > 0
    new[live] = acc[live] / norms[live, None]
    return new
