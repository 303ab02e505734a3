"""Reciprocal-rank fusion (RRF) — the standard hybrid-retrieval
baseline (Cormack, Clarke & Buettcher, SIGIR 2009): combine ranked
lists from heterogeneous retrievers (BM25 text rank, embedding
cosine rank, ...) by summing 1/(k + rank) per list, k = 60 by
convention. RRF needs no score calibration across retrievers — only
ranks — which is exactly why it is the default fusion in hybrid
search engines.

Scale shape: the inputs are top-N retrieval outputs (N ≈ 10-1000),
already driver-sized by construction — every join here is a
broadcast full-outer over bounded lists, never a corpus shuffle. The
corpus-sized work happened upstream in the retrievers (inverted-
index-filtered BM25, bucketed ANN); fusion is O(Σ list lengths).

Reference parity note: the reference UI surfaces one ranked result
stream per query (src/main.cpp task-handler result path); fusion of
multiple rankers is the [N]-class extension for retrieval pipelines.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rrf_fuse(
    ranked: dict[str, DataFrame],
    k: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Fuse named ranked lists into one RRF-ordered frame.

    ``ranked`` maps a list name to a DataFrame with columns
    (``id_col``, ``rank``) where rank is 1-based. Returns one row
    per id appearing in ANY list with a ``<name>_rank`` column per
    input (null where absent — a missing list contributes 0 to the
    fusion, the published convention) plus the ``rrf`` score.
    Deterministic: ranks are integers, so the two-term reciprocal
    sum is bit-identical across engines and partitionings.
    """
    if not ranked:
        raise ValueError("rrf_fuse requires at least one ranked list")
    sides = [
        df.select(
            F.col(id_col),
            F.col("rank").cast("long").alias(f"{name}_rank"),
        )
        for name, df in ranked.items()
    ]
    joined = reduce(
        lambda a, b: a.join(b, on=id_col, how="full_outer"), sides
    )
    score = reduce(
        lambda acc, name: acc
        + F.coalesce(
            F.lit(1.0) / (F.lit(k) + F.col(f"{name}_rank")), F.lit(0.0)
        ),
        ranked.keys(),
        F.lit(0.0),
    )
    return joined.withColumn("rrf", score)
