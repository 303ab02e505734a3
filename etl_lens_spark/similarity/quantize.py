"""Embedding compression for similarity at scale: int8 scalar
quantization and random projection ([N] surface — the storage/compute
levers an ANN pipeline pulls before sharding 100 TB of vectors).

- ``quantize_int8``: per-vector symmetric scalar quantization
  (scale = max|x| / 127, q_i = round(x_i / scale) as int8). 4×
  smaller than float32, 8× smaller than the float64 compute form;
  cosine on dequantized vectors is within ~1% of exact for
  unit-scale embeddings. All JVM array expressions — the quantized
  column shuffles and stores cheap, and Parquet dictionary/RLE
  encodes int8 arrays tightly.
- ``dequantize``: q_i * scale back to double, composable with the
  exact scorers in knn.py (so one scoring implementation serves both
  paths).
- ``random_project``: deterministic Gaussian projection to a lower
  dimension (seeded literal planes, same convention as knn.make_planes)
  — Johnson-Lindenstrauss distance preservation; the cheap first stage
  before LSH/IVF when the source dimension is large.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_lens_spark.similarity.knn import _as_double, dot


def quantize_int8(
    emb: DataFrame,
    vec_col: str = "embedding",
    q_col: str = "qvec",
    scale_col: str = "qscale",
) -> DataFrame:
    """Add int8-quantized vector + per-vector scale. Zero vectors get
    scale 0 and all-zero codes (dequantize restores exact zeros)."""
    v = _as_double(F.col(vec_col))
    max_abs = F.array_max(F.transform(v, F.abs))
    scale = F.when(max_abs > 0, max_abs / F.lit(127.0)).otherwise(F.lit(0.0))
    d = emb.withColumn(scale_col, scale)
    q = F.when(
        F.col(scale_col) > 0,
        F.transform(
            _as_double(F.col(vec_col)),
            lambda x: F.round(x / F.col(scale_col)).cast("tinyint"),
        ),
    ).otherwise(
        F.transform(_as_double(F.col(vec_col)), lambda x: F.lit(0).cast("tinyint"))
    )
    return d.withColumn(q_col, q)


def dequantize(q: Column, scale: Column) -> Column:
    """int8 codes × scale → array<double> (composes with knn scorers)."""
    return F.transform(q, lambda x: x.cast("double") * scale)


def random_project(
    emb: DataFrame,
    dim: int,
    out_dim: int,
    vec_col: str = "embedding",
    out_col: str = "proj",
    seed: int = 42,
) -> DataFrame:
    """Project to ``out_dim`` dims with a seeded Gaussian matrix
    (scaled by 1/sqrt(out_dim) so expected squared distances are
    preserved — the JL convention). Planes ride into codegen as
    literals; one sequential dot product per output dim."""
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = (rng.standard_normal((out_dim, dim)) / np.sqrt(out_dim)).tolist()
    v = _as_double(F.col(vec_col))
    comps = [
        dot(v, F.array(*[F.lit(x) for x in plane])) for plane in planes
    ]
    return emb.withColumn(out_col, F.array(*comps))
