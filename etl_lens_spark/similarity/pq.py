"""Product quantization (PQ) approximate nearest neighbor — the
memory-compression scale path alongside SRP-LSH (knn.py) and IVF
(ivf.py).

Plan: (1) split the (cosine-normalized) vector into ``m`` contiguous
subspaces and train an independent k-means codebook per subspace —
one distributed partial-sums pass per Lloyd iteration covering ALL
subspaces at once (same O(partitions · m · k · dsub) shuffle shape the
round-1 verdict asked for in IVF training; the corpus never shuffles);
(2) encode every corpus vector to ``m`` uint8 codes — a 32×
compression at dim=64/m=8 (64 floats → 8 bytes), which is what lets a
100 TB embedding corpus fit executor memory as code tables; (3) score
queries by asymmetric distance computation (ADC): per query build an
(m × k) lookup table of subspace inner products against the codebooks,
then a corpus pass sums m table lookups per vector — no float vector
ever touches the scoring join.

Scale posture: codebooks and the query LUT block are broadcast state
(tiny); scoring is one mapInPandas over the *codes* table with
per-partition local top-k, then a window-based global top-k — the
shuffle carries only partitions × queries × k candidate rows.

[N] north-star surface (SURVEY §2.3); no reference counterpart.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _normalized(series: pd.Series) -> np.ndarray:
    m = np.asarray(series.tolist(), dtype=np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _subspace_bounds(dim: int, m: int) -> list[tuple[int, int]]:
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    d = dim // m
    return [(i * d, (i + 1) * d) for i in range(m)]


def train_codebooks(
    emb: DataFrame,
    dim: int,
    m: int = 8,
    k_codes: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Per-subspace L2 k-means over cosine-normalized vectors.
    Returns codebooks of shape (m, k_codes, dim//m).

    Init is deterministic (the k_codes smallest-id vectors, sliced per
    subspace). Each Lloyd iteration is ONE mapInPandas pass emitting a
    per-partition (m · k · dsub) accumulator as tiny rows, reduced by
    groupBy — train cost is independent of corpus row width and the
    corpus itself never shuffles (the IVF-training discipline from
    similarity/ivf.py, generalized to m codebooks at once)."""
    bounds = _subspace_bounds(dim, m)
    dsub = dim // m
    init = _normalized(
        emb.orderBy(id_col).limit(k_codes).select(vec_col).toPandas()[vec_col]
    )
    if init.shape[0] < k_codes:
        raise ValueError(
            f"need >= {k_codes} vectors to init codebooks, got {init.shape[0]}"
        )
    books = np.stack([init[:, a:b].copy() for a, b in bounds])  # (m,k,dsub)

    for _ in range(iters):
        # ONE definition of the Lloyd step (refine_codebooks), shared
        # with the maintained-index staleness dial so training and
        # re-train candidates cannot diverge (the ivf.py round-10
        # discipline)
        books = refine_codebooks(emb, books, vec_col)
    return books


def refine_codebooks(
    emb: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
) -> np.ndarray:
    """One Lloyd step from EXISTING codebooks over the current
    corpus — code ids keep their identity (each centroid moves
    toward the mean of its current members; a code that lost all
    members keeps its old position), which is what makes the
    maintained-codes staleness comparison well-defined. Same
    distributed partial-sums pass as training; only m × k × dsub
    floats return to the driver."""
    cb = codebooks
    n_sub, k_codes, dsub = cb.shape
    bounds = [(i * dsub, (i + 1) * dsub) for i in range(n_sub)]

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((n_sub, k_codes, dsub), dtype=np.float64)
        cnt = np.zeros((n_sub, k_codes), dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = _normalized(pdf[vec_col])
            for mi, (a, b) in enumerate(bounds):
                xs = x[:, a:b]  # (rows, dsub)
                # L2 argmin == argmax(2<x,c> - |c|^2) per row
                d2 = (
                    2.0 * (xs @ cb[mi].T)
                    - (cb[mi] ** 2).sum(axis=1)[None, :]
                )
                codes = np.argmax(d2, axis=1)
                np.add.at(acc[mi], codes, xs)
                cnt[mi] += np.bincount(codes, minlength=k_codes)
        mi_idx, code_idx = np.nonzero(cnt)
        if len(mi_idx) == 0:
            return
        rows = []
        for mi, ci in zip(mi_idx, code_idx):
            rows.append(
                {
                    "sub": int(mi),
                    "code": int(ci),
                    "s": acc[mi, ci].tolist(),
                    "n": int(cnt[mi, ci]),
                }
            )
        yield pd.DataFrame(rows)

    sums = (
        emb.select(vec_col)
        .mapInPandas(part, "sub int, code int, s array<double>, n long")
        .groupBy("sub", "code")
        .agg(
            F.array(
                *[
                    F.sum(F.col("s").getItem(i)).alias(f"s{i}")
                    for i in range(dsub)
                ]
            ).alias("s"),
            F.sum("n").alias("n"),
        )
        .toPandas()
    )
    new = cb.copy()
    for _, r in sums.iterrows():
        if r["n"] > 0:
            new[int(r["sub"]), int(r["code"])] = (
                np.asarray(r["s"], dtype=np.float64) / r["n"]
            )
    return new


def encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — m uint8-range codes per vector. At
    100 TB this table (plus the codebooks) *replaces* the float
    corpus for similarity scans."""
    cb = codebooks
    m, k, dsub = cb.shape
    bounds = [(i * dsub, (i + 1) * dsub) for i in range(m)]

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = _normalized(pdf[vec_col])
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for mi, (a, b) in enumerate(bounds):
                xs = x[:, a:b]
                d2 = 2.0 * (xs @ cb[mi].T) - (cb[mi] ** 2).sum(axis=1)[None, :]
                codes[:, mi] = np.argmax(d2, axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "codes": list(codes)}
            )

    return emb.select(id_col, vec_col).mapInPandas(
        enc, f"{id_col} long, codes array<int>"
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    m: int = 16,
    k_codes: int = 32,
    train_iters: int = 5,
    rerank: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    max_queries: int = 10_000,
) -> DataFrame:
    """Approximate top-k: ADC shortlist over PQ codes, then exact
    re-rank of the shortlist (the FAISS IVF-PQ + refine pattern).

    The query block is collected to the driver (size-guarded, same
    contract as brute_force_topk) and broadcast into a single corpus
    mapInPandas pass that scores EVERY query against its partition of
    codes via m table lookups per vector, keeping a local shortlist of
    ``rerank × k`` candidates; a window over the shuffled (partitions ×
    queries × rerank·k) candidates takes the global shortlist, which
    joins back to the float corpus for exact-cosine re-ranking — the
    exact pass touches only queries × rerank·k vectors, not the
    corpus. On the near-random fixture embeddings the ADC-only ranking
    tops out near recall 0.6; shortlist-50 + exact re-rank measures
    0.98 (tests/test_knn.py).
    """
    # fail fast BEFORE the eager codebook training pays iters full
    # distributed passes (round-10 review fix); the delegation below
    # passes max_queries=None so the guard's count job runs ONCE
    if queries.limit(max_queries + 1).count() > max_queries:
        raise ValueError(
            f"pq_topk broadcasts the query block and got more than "
            f"max_queries={max_queries} queries; raise max_queries "
            "explicitly if you mean it"
        )
    books = train_codebooks(
        corpus, dim, m=m, k_codes=k_codes, iters=train_iters,
        id_col=id_col, vec_col=vec_col,
    )
    codes = encode(corpus, books, id_col, vec_col)
    return pq_probe_topk(
        codes,
        corpus,
        queries,
        books,
        k=k,
        rerank=rerank,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        max_queries=None,
    )


def pq_probe_topk(
    codes: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    rerank: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    max_queries: int | None = 10_000,
) -> DataFrame:
    """The ADC + shortlist + exact-re-rank half of pq_topk, factored
    so a MAINTAINED codes lake table serves queries without
    re-encoding the corpus (sim_pq_incremental_cdf): the codes table
    replaces the float corpus for the scan; ``corpus`` (the source
    embeddings table itself — no extra maintained state) is touched
    only for the queries × rerank·k exact re-rank. One definition
    shared with the build-once path, so the two cannot score
    differently. ``max_queries=None`` skips the size guard — for
    callers (pq_topk) that already validated the same frame, so the
    guard's count job runs once per call chain."""
    if max_queries is not None and (
        queries.limit(max_queries + 1).count() > max_queries
    ):
        raise ValueError(
            f"pq_topk broadcasts the query block and got more than "
            f"max_queries={max_queries} queries; raise max_queries "
            "explicitly if you mean it"
        )
    from pyspark.sql import Window

    books = codebooks
    m = books.shape[0]
    dim = m * books.shape[2]

    qpdf = queries.select(id_col, vec_col).toPandas()
    qids = qpdf[id_col].to_numpy()
    qx = _normalized(qpdf[vec_col])  # (q, dim)
    dsub = dim // m
    # ADC lookup tables: inner product of each query subvector with
    # each codebook centroid -> (q, m, k_codes)
    luts = np.einsum("qmd,mkd->qmk", qx.reshape(len(qx), m, dsub), books)
    nq = len(qids)
    shortlist = rerank * k

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c = np.asarray(pdf["codes"].tolist(), dtype=np.int64)  # (r, m)
            ids = pdf[id_col].to_numpy()
            # S[q, r] = sum_m LUT[q, m, c[r, m]]
            s = np.zeros((nq, len(c)), dtype=np.float64)
            for mi in range(m):
                s += luts[:, mi, c[:, mi]]
            top = min(shortlist + 1, len(c))  # +1 slack for self-match
            idx = np.argpartition(-s, top - 1, axis=1)[:, :top]
            out_q = np.repeat(qids, top)
            out_n = ids[idx.ravel()]
            out_s = np.take_along_axis(s, idx, axis=1).ravel()
            yield pd.DataFrame(
                {
                    query_id_col: out_q,
                    "neighbor_id": out_n,
                    "approx_sim": out_s,
                }
            )

    cand = codes.mapInPandas(
        score, f"{query_id_col} long, neighbor_id long, approx_sim double"
    ).filter(F.col(query_id_col) != F.col("neighbor_id"))
    w_short = Window.partitionBy(query_id_col).orderBy(
        F.col("approx_sim").desc(), F.col("neighbor_id").asc()
    )
    cand = (
        cand.withColumn("__r", F.row_number().over(w_short))
        .filter(F.col("__r") <= shortlist)
        .drop("__r")
    )
    # exact re-rank: shortlist joins back to the float corpus (tiny
    # broadcast-able frame vs the corpus scan ADC just avoided) and to
    # the query vectors; final order is true cosine
    from etl_lens_spark.similarity.knn import _as_double, dot, norm as vnorm

    cvec = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("__cvec"),
    )
    qvec = queries.select(
        F.col(id_col).alias(query_id_col),
        _as_double(F.col(vec_col)).alias("__qvec"),
    )
    exact = (
        cand.join(cvec, "neighbor_id")
        .join(F.broadcast(qvec), query_id_col)
        .withColumn(
            "cos_sim",
            dot(F.col("__cvec"), F.col("__qvec"))
            / (vnorm(F.col("__cvec")) * vnorm(F.col("__qvec"))),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank_n", F.row_number().over(w).cast("long"))
        .filter(F.col("rank_n") <= k)
        .select(query_id_col, "neighbor_id", "rank_n", "cos_sim", "approx_sim")
    )


def codebooks_to_df(spark, codebooks: np.ndarray, epoch: int):
    """The (m, k, dsub) codebook tensor as rows ``(sub, code, dim_i,
    val, epoch)`` — the persistence format that lets the quantizer
    live as a MEMBER REL of the codes table's own lake log, so one
    atomic multi-table commit swaps (codes, codebooks) together and
    a reader resolving any version decodes with a matched pair (the
    sim_pq_retrain_swap zero-downtime contract; the PQ analog of
    ivf.centroids_to_df). m·k·dsub = m·k·(dim/m) = k·dim rows —
    driver-sized."""
    m, k, dsub = codebooks.shape
    rows = [
        (int(mi), int(ci), int(j), float(codebooks[mi, ci, j]), int(epoch))
        for mi in range(m)
        for ci in range(k)
        for j in range(dsub)
    ]
    return spark.createDataFrame(
        rows, "sub int, code int, dim_i int, val double, epoch int"
    )


def codebooks_from_df(books_df) -> tuple[np.ndarray, int]:
    """Inverse of codebooks_to_df: ``(tensor, epoch)`` from the
    books member rel at one version. RAISES on a mixed-epoch read —
    ADC lookup tables built from a Frankenstein codebook mis-rank
    silently, so a torn state must not even deserialize (the
    centroids_from_df discipline)."""
    rows = books_df.collect()
    epochs = {r["epoch"] for r in rows}
    if len(epochs) != 1:
        raise ValueError(
            f"torn codebook state: epochs {sorted(epochs)} in one "
            "snapshot (the atomic swap contract is broken)"
        )
    m = max(r["sub"] for r in rows) + 1
    k = max(r["code"] for r in rows) + 1
    dsub = max(r["dim_i"] for r in rows) + 1
    t = np.zeros((m, k, dsub), dtype=np.float64)
    for r in rows:
        t[r["sub"], r["code"], r["dim_i"]] = r["val"]
    return t, epochs.pop()
