"""Semantic clustering + SemDeDup invariants (beyond the oracle gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_lens_spark.similarity.kmeans import kmeans_assign

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_kmeans_deterministic_and_total(spark):
    e = _emb(spark)
    a1 = kmeans_assign(e, k=4, iters=2).collect()
    a2 = kmeans_assign(e, k=4, iters=2).collect()
    assert sorted(map(tuple, a1)) == sorted(map(tuple, a2))
    n = e.count()
    assert len(a1) == n  # every vector assigned exactly once
    assert all(0 <= r["cluster"] < 4 for r in a1)


def test_kmeans_improves_over_random_split(spark):
    """After Lloyd passes, the learned partition should beat a
    hash-random partition of the same k on within-cluster SSE."""
    e = _emb(spark).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    k = 4

    def sse(assign):
        j = e.join(assign, "vec_id")
        cent = (
            j.select("cluster", F.posexplode("v").alias("idx", "val"))
            .groupBy("cluster", "idx")
            .agg(F.avg("val").alias("c"))
        )
        long = j.select("vec_id", "cluster", F.posexplode("v").alias("idx", "val"))
        return (
            long.join(cent, ["cluster", "idx"])
            .select(((F.col("val") - F.col("c")) ** 2).alias("sq"))
            .agg(F.sum("sq"))
            .first()[0]
        )

    learned = kmeans_assign(_emb(spark), k=k, iters=3)
    random_split = e.select(
        "vec_id", (F.xxhash64("vec_id") % k + k) % k
    ).toDF("vec_id", "cluster")
    assert sse(learned) < sse(random_split)


def test_semdedup_drop_iff_lower_id_neighbor(spark):
    """keep=False ⟺ an in-cluster lower-id vector clears tau."""
    from etl_lens_spark.queries import REGISTRY, _load
    from etl_lens_spark.queries.semantic_q import SEM_TAU
    from etl_lens_spark.similarity import knn

    _load()
    res = REGISTRY["dedup_semantic_semdedup"].fn(spark, SF)
    rows = {r["vec_id"]: (r["cluster"], r["keep"]) for r in res.collect()}
    e = _emb(spark).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    vecs = {r["vec_id"]: r["v"] for r in e.collect()}

    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    for vid, (cl, keep) in rows.items():
        has_lower = any(
            o < vid and rows[o][0] == cl and cos(vecs[o], vecs[vid]) >= SEM_TAU
            for o in rows
        )
        assert keep == (not has_lower), vid
