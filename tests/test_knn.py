"""Similarity search: brute-force correctness on constructed vectors;
SRP-LSH agreement with brute force on the fixture corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_lens_spark.similarity import knn
from etl_lens_spark.sources.tables import load_table


def test_cosine_identity_and_orthogonal(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], [1.0, 0.0]),
            (2, [1.0, 0.0], [0.0, 1.0]),
            (3, [1.0, 0.0], [-1.0, 0.0]),
        ],
        "id long, a array<double>, b array<double>",
    )
    out = df.select(
        "id", knn.cosine_similarity(F.col("a"), F.col("b")).alias("c")
    ).collect()
    got = {r["id"]: r["c"] for r in out}
    assert got[1] == pytest.approx(1.0)
    assert got[2] == pytest.approx(0.0)
    assert got[3] == pytest.approx(-1.0)


def test_brute_force_topk_finds_planted_neighbor(spark):
    rows = [(i, [float(i), 1.0, 0.0]) for i in range(20)]
    rows.append((100, [5.001, 1.0, 0.0]))  # nearly identical to vec 5
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = corpus.filter(F.col("vec_id") == 100)
    out = knn.brute_force_topk(corpus, q, k=1).collect()
    assert len(out) == 1
    assert out[0]["neighbor_id"] == 5
    assert out[0]["cos_sim"] > 0.999


def test_lsh_topk_finds_strong_matches(spark):
    # SRP-LSH's contract: near-identical vectors land in the same
    # bucket with overwhelming probability (collision prob per bit =
    # 1 - theta/pi -> 1 as theta -> 0). Weakly-similar random vectors
    # are NOT guaranteed to collide — so the test plants strong pairs.
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal((10, 16)).astype("float32")
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        near = v + rng.standard_normal(16).astype("float32") * 0.01
        rows.append((100 + i, [float(x) for x in near]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = corpus.filter(F.col("vec_id") < 10)
    ls = knn.lsh_topk(corpus, queries, dim=16, k=1, n_bits=6).collect()
    found = {r["qid"]: r["neighbor_id"] for r in ls}
    hits = sum(1 for q, n in found.items() if n == 100 + q)
    assert hits >= 8, f"planted near-dup found for only {hits}/10 queries"


def test_lsh_topk_similarities_are_exact(spark, sf_dir):
    # whatever candidates LSH scores, the similarity values must equal
    # the brute-force values for the same pairs
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    bf = {
        (r["qid"], r["neighbor_id"]): r["cos_sim"]
        for r in knn.brute_force_topk(emb, queries, k=10**6).collect()
    }
    ls = knn.lsh_topk(emb, queries, dim=64, k=5, n_bits=4).collect()
    for r in ls:
        assert bf[(r["qid"], r["neighbor_id"])] == pytest.approx(
            r["cos_sim"], abs=1e-12
        )


def test_ivf_topk_recall_vs_brute_force(spark, sf_dir):
    from etl_lens_spark.similarity import ivf

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    bf = {
        (r["qid"], r["neighbor_id"])
        for r in knn.brute_force_topk(emb, queries, k=5).collect()
    }
    iv = ivf.ivf_topk(
        emb, queries, k=5, n_cells=16, nprobe=6, train_iters=3
    ).collect()
    got = {(r["qid"], r["neighbor_id"]) for r in iv}
    recall = len(got & bf) / len(bf)
    assert recall >= 0.6, f"IVF recall@5 too low: {recall}"
    # similarities for reported pairs are exact
    bf_all = {
        (r["qid"], r["neighbor_id"]): r["cos_sim"]
        for r in knn.brute_force_topk(emb, queries, k=10**6).collect()
    }
    for r in iv:
        assert bf_all[(r["qid"], r["neighbor_id"])] == pytest.approx(
            r["cos_sim"], abs=1e-9
        )
