"""PCA / whitening queries over the embeddings fixture.

``emb_pca_covariance`` pins the distributed sufficient-statistics
pass (the whole fit reduces to these sums — if they match DuckDB's
relational recomputation exactly, the only remaining code between
fit and output is numpy's eigh on a 64 × 64 matrix).
``emb_pca_whiten`` is the full pipeline: fit → broadcast → project →
Mahalanobis outlier score; eigendecomposition is not SQL-expressible,
so it's rows-only here and pinned by unit tests instead (whitened
covariance = I, numpy single-machine parity, basis-independence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_lens_spark.queries import query
from etl_lens_spark.sources.tables import load_table


@query(
    "emb_pca_covariance",
    oracle="""
    WITH x AS (
        SELECT vec_id,
               unnest(range(0, len(embedding))) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS xv
        FROM embeddings
    ),
    n AS (SELECT COUNT(*) AS n FROM embeddings),
    m AS (SELECT i, AVG(xv) AS mu FROM x GROUP BY i),
    p AS (
        SELECT a.i AS i, b.i AS j, SUM(a.xv * b.xv) AS sxx
        FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
        GROUP BY a.i, b.i
    )
    SELECT p.i, p.j,
           ROUND(p.sxx / n.n - ma.mu * mb.mu, 6) AS cov
    FROM p, n
    JOIN m ma ON ma.i = p.i
    JOIN m mb ON mb.i = p.j
    ORDER BY p.i, p.j
    """,
)
def emb_pca_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population covariance of the embedding matrix, upper triangle,
    via the distributed sufficient-statistics pass (one Arrow-batched
    map → O(partitions · d²) partials → driver combine in fixed
    order). The oracle recomputes every entry relationally from a
    zipped-unnest self-join — any slip in the partial-sum algebra,
    the batch stacking, or the mean centering shifts some entry.

    Scale: the exchange carries d² doubles per partition (32 KB at
    d = 64), never the n × d points — the same treeAggregate shape
    that makes IVF training and normal-equations regression flat in
    n. Driver work is O(d²) combine + O(d³) eigh, independent of n."""
    from etl_lens_spark.similarity.pca import fit_pca

    model = fit_pca(load_table(spark, sf_dir, "embeddings"))
    cov = model["cov"]
    d = cov.shape[0]
    rows = [
        (i, j, round(float(cov[i, j]), 6))
        for i in range(d)
        for j in range(i, d)
    ]
    return spark.createDataFrame(
        rows, "i long, j long, cov double"
    ).orderBy("i", "j")


@query("emb_pca_whiten")
def emb_pca_whiten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ZCA-whitening pipeline + Mahalanobis outlier score: fit
    on the distributed sufficient statistics, broadcast W and μ,
    project every vector (one matmul per Arrow batch, no shuffle),
    and emit ‖W(x−μ)‖² — the basis-independent Mahalanobis distance
    a curation pass thresholds to drop distributional outliers
    before semantic dedup. Rows-only by design (eigendecomposition
    is not SQL-expressible); exactness is pinned in
    tests/test_pca.py: whitened covariance = I within float eps,
    bit-parity with a single-machine numpy reference, and score
    invariance under an orthogonal re-basis of the input."""
    from etl_lens_spark.similarity.pca import apply_whiten, fit_pca

    emb = load_table(spark, sf_dir, "embeddings")
    model = fit_pca(emb)
    z = apply_whiten(emb, model, keep=["vec_id", "label"])
    maha = F.aggregate(
        F.transform("z", lambda v: v * v),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    return (
        z.select(
            "vec_id",
            "label",
            F.round(maha, 6).alias("maha_sq"),
        )
        .orderBy("vec_id")
    )


@query("emb_procrustes_align")
def emb_procrustes_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orthogonal Procrustes alignment between two embedding spaces —
    the model-migration primitive: when a new encoder re-embeds the
    corpus, the old index aligns to it with one rotation R̂ = UVᵀ
    from the SVD of the cross-covariance M = AᵀB, instead of
    re-scoring everything. Here space B is space A under a PLANTED
    deterministic rotation (a product of fixed-angle Givens blocks),
    so the query can audit itself: it emits the Frobenius error of
    the recovered-vs-planted rotation (≈0), the orthogonality defect
    of R̂, and the post-alignment residual.

    Distributed discipline mirrors emb_pca_whiten: the ONLY row-scale
    work is one Arrow-batched pass accumulating per-batch partial
    d×d Gram blocks (map-side sum; d²=4096 doubles per batch row),
    one element-wise reduce, then numpy SVD on the 64×64 M at the
    driver — the sufficient-statistics route, not a collect of
    vectors. SVD is not SQL-expressible → rows-only; the planted-
    rotation recovery IS the correctness proof (tests/test_pca.py)."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    d = 64

    def rot_matrix() -> "np.ndarray":
        R = np.eye(d)
        for k in range(d // 2):
            th = 0.1 + 0.05 * k
            c, s = np.cos(th), np.sin(th)
            G = np.eye(d)
            i, j = 2 * k, 2 * k + 1
            G[i, i] = c
            G[i, j] = -s
            G[j, i] = s
            G[j, j] = c
            R = R @ G
        return R

    def partials(it):
        R = rot_matrix()
        for pdf in it:
            A = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            B = A @ R.T  # planted rotation: b = R a
            M = A.T @ B  # partial cross-covariance
            yield pd.DataFrame(
                {"m": [M.reshape(-1).tolist()], "n": [len(A)]}
            )

    parts = emb.mapInPandas(partials, "m array<double>, n long")
    cells = parts.select(
        F.posexplode("m").alias("idx", "v"), "n"
    )
    summed = cells.groupBy("idx").agg(F.sum("v").alias("v"))
    n_vecs = parts.agg(F.sum("n").cast("long").alias("n_vecs"))
    M = np.zeros(d * d)
    for r in summed.collect():
        M[r.idx] = r.v
    M = M.reshape(d, d)
    n = n_vecs.collect()[0].n_vecs
    U, _, Vt = np.linalg.svd(M)
    # align B back onto A: a ≈ R_hat^T b with R_hat from M = A^T B
    R_hat = (U @ Vt).T
    R = rot_matrix()
    rec_err = float(np.linalg.norm(R_hat - R))
    orth_err = float(np.linalg.norm(R_hat.T @ R_hat - np.eye(d)))

    def residual(it):
        Rh = R_hat
        Rp = rot_matrix()
        for pdf in it:
            A = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            B = A @ Rp.T
            back = B @ Rh
            res = np.sqrt(((back - A) ** 2).sum(axis=1))
            yield pd.DataFrame({"s": [float(res.sum())], "c": [len(A)]})

    res = emb.mapInPandas(residual, "s double, c long").agg(
        (F.sum("s") / F.sum("c")).alias("mean_residual")
    )
    mean_res = res.collect()[0].mean_residual
    return spark.createDataFrame(
        [(int(n), d, rec_err, orth_err, float(mean_res))],
        "n_vecs long, d int, rotation_recovery_err double, "
        "orthogonality_err double, mean_residual double",
    )


_FD_ELL = 16  # sketch rows; spectral error bound ||A'A - B'B|| <= ||A||_F^2 / ell


@query("emb_frequent_directions_sketch")
def emb_frequent_directions_sketch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Frequent Directions matrix sketch (Liberty 2013; Ghashami et
    al. 2016) of the embedding matrix — the covariance-sketch answer
    to "PCA over 100 TB of vectors without materializing AᵀA": each
    partition streams its rows through a 2ℓ×d buffer (SVD-shrink when
    full), and partial sketches MERGE by concatenate-and-shrink —
    associative and mergeable exactly like the KMV/HLL sketches, so
    the plan is mapInPandas partials + one reduce, state 2ℓ·d floats
    per partition. The deterministic guarantee (not probabilistic!):
    0 ⪯ AᵀA − BᵀB ⪯ (‖A‖²_F/ℓ)·I.

    Output audits the guarantee on the fixture: spectral error of the
    sketch covariance vs the exact one (computable here because d=64)
    against the proven bound, plus the top-5 singular-value relative
    errors. Rows-only (SVD inside); tests pin bound satisfaction and
    merge-order invariance. The full-registry partition-permutation
    sweep (tools/permutation_probe.py, round 5) flags this query —
    correctly: the sketch VALUES depend on row-processing order by
    the algorithm's nature, while the audited bound holds under any
    partitioning; it is the registry's one declared-order-free
    contract (439/441 queries are bit-stable across partitionings)."""
    import numpy as np
    import pandas as pd

    ell = _FD_ELL
    d = 64

    def fd_shrink(B: "np.ndarray") -> "np.ndarray":
        # B: (<=2ell, d) -> (ell, d) via SVD shrinkage
        U, s, Vt = np.linalg.svd(B, full_matrices=False)
        if len(s) > ell:
            delta = s[ell - 1] ** 2
            s2 = np.sqrt(np.maximum(s[:ell] ** 2 - delta, 0.0))
            return s2[:, None] * Vt[:ell]
        return B

    def partial(it):
        B = np.zeros((0, d))
        n = 0
        for pdf in it:
            A = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            n += len(A)
            i = 0
            while i < len(A):
                take = min(2 * ell - len(B), len(A) - i)
                B = np.vstack([B, A[i : i + take]])
                i += take
                if len(B) >= 2 * ell:
                    B = fd_shrink(B)
            # exact Gram partial for the audit
        if n == 0:
            return
        yield pd.DataFrame(
            {"b": [B.reshape(-1).tolist()], "rows": [B.shape[0]],
             "n": [n]}
        )

    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    parts = emb.mapInPandas(
        partial, "b array<double>, rows long, n long"
    ).collect()
    # merge partial sketches (concatenate + shrink) — associative
    import numpy as np  # noqa: F811

    B = np.zeros((0, d))
    n_total = 0
    for r in parts:
        Bi = np.array(r.b).reshape(r.rows, d)
        n_total += r.n
        B = fd_shrink(np.vstack([B, Bi])) if len(B) + len(Bi) > ell \
            else np.vstack([B, Bi])
    # exact covariance for the audit (distributed moment pass)
    def gram(it):
        for pdf in it:
            A = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            yield pd.DataFrame(
                {"g": [(A.T @ A).reshape(-1).tolist()]}
            )

    cells = (
        emb.mapInPandas(gram, "g array<double>")
        .select(F.posexplode("g").alias("idx", "v"))
        .groupBy("idx")
        .agg(F.sum("v").alias("v"))
        .collect()
    )
    G = np.zeros(d * d)
    for r in cells:
        G[r.idx] = r.v
    G = G.reshape(d, d)
    S = B.T @ B
    err = float(np.linalg.norm(G - S, 2))
    fro2 = float(np.trace(G))
    bound = fro2 / ell
    sv_exact = np.sqrt(
        np.maximum(np.linalg.eigvalsh(G)[::-1][:5], 0)
    )
    sv_sketch = np.sqrt(
        np.maximum(np.linalg.eigvalsh(S)[::-1][:5], 0)
    )
    rel = [
        float(abs(a - b) / a) if a > 0 else 0.0
        for a, b in zip(sv_exact, sv_sketch)
    ]
    return spark.createDataFrame(
        [
            (
                int(n_total),
                d,
                ell,
                err,
                bound,
                err <= bound + 1e-9,
                float(max(rel)),
            )
        ],
        "n_vecs long, d int, ell int, spectral_err double, "
        "fd_bound double, bound_holds boolean, top5_sv_max_rel_err double",
    )
