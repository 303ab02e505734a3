"""Distributed PCA / ZCA whitening for embedding columns.

The standard preprocessing stage in front of semantic dedup and ANN
(SemDeDup and friends whiten or at least center+rotate embeddings so
cosine/L2 structure reflects semantics, not anisotropic feature
scales). The distributed shape is the same treeAggregate pattern as
IVF training and the normal-equations regression:

1. **Fit** — one Arrow-batched pass computes per-batch sufficient
   statistics (n, Σx, ΣxxT): O(partitions · d²) numbers cross the
   wire, never the n × d point stream. The driver combines partials
   in a fixed order (deterministic float sums), eigendecomposes the
   d × d covariance (numpy ``eigh`` — d is small by construction;
   100 TB changes n, not d), and builds the ZCA whitening matrix
   W = U diag(1/√(λ+eps)) Uᵀ.
2. **Apply** — W and the mean broadcast to executors; projection is
   one numpy matmul per Arrow batch, no shuffle.

Anything downstream (Mahalanobis outlier pruning, whitened cosine)
is then an embarrassingly-parallel map. Reference parity: none (the
reference renders no vectors); this is north-star curation surface.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.ArrayType(T.DoubleType())),
        T.StructField("ss", T.ArrayType(T.DoubleType())),
    ]
)


def fit_pca(df: DataFrame, col: str = "embedding", eps: float = 1e-6) -> dict:
    """Fit mean/covariance/eigenbasis/whitening from an array column.

    Returns {"n", "mean", "cov", "eigvals" (desc), "components"
    (rows = components, desc eigval order), "whiten" (ZCA d × d)}.
    """

    def partials(it):
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            X = np.stack(pdf[col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [X.shape[0]],
                    "s": [X.sum(axis=0).tolist()],
                    "ss": [(X.T @ X).ravel().tolist()],
                }
            )

    rows = df.select(col).mapInPandas(partials, _PARTIAL_SCHEMA).collect()
    if not rows:
        raise ValueError("fit_pca: empty input")
    # fixed combine order → deterministic float sums run-to-run
    n = sum(r["n"] for r in rows)
    d = len(rows[0]["s"])
    s = np.add.reduce([np.asarray(r["s"]) for r in rows])
    ss = np.add.reduce([np.asarray(r["ss"]) for r in rows]).reshape(d, d)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    cov = (cov + cov.T) / 2.0  # enforce exact symmetry before eigh
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.argsort(eigvals)[::-1]
    eigvals, eigvecs = eigvals[order], eigvecs[:, order]
    inv_sqrt = 1.0 / np.sqrt(np.maximum(eigvals, 0.0) + eps)
    whiten = (eigvecs * inv_sqrt[None, :]) @ eigvecs.T  # ZCA
    return {
        "n": int(n),
        "mean": mean,
        "cov": cov,
        "eigvals": eigvals,
        "components": eigvecs.T,
        "whiten": whiten,
    }


def apply_whiten(
    df: DataFrame,
    model: dict,
    col: str = "embedding",
    out_col: str = "z",
    keep: list[str] | None = None,
) -> DataFrame:
    """Project rows through the fitted whitening: z = W (x − μ).

    Broadcast-sized model, one matmul per Arrow batch, zero shuffle.
    Keeps ``keep`` passthrough columns (default: all non-array cols).
    """
    spark = df.sparkSession
    keep = keep if keep is not None else [
        f.name for f in df.schema.fields if f.name != col
    ]
    bc = spark.sparkContext.broadcast(
        (model["mean"].tolist(), model["whiten"].tolist())
    )
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name in keep]
        + [T.StructField(out_col, T.ArrayType(T.DoubleType()))]
    )

    def project(it):
        import pandas as pd

        mean, W = (np.asarray(a) for a in bc.value)
        for pdf in it:
            if not len(pdf):
                continue
            X = np.stack(pdf[col].to_numpy()).astype(np.float64)
            Z = (X - mean[None, :]) @ W.T
            out = pd.DataFrame({k: pdf[k] for k in keep})
            out[out_col] = list(Z)
            yield out

    return df.select(*keep, col).mapInPandas(project, out_schema)
