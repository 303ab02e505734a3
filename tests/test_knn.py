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


def test_lsh_multiprobe_recall_at_equal_candidate_budget(spark):
    """Multi-probe contract: probes=4 with 2 extra bits has the SAME
    expected candidate count as single-probe (4/2^(b+2) == 1/2^b) but
    better recall on planted moderately-similar pairs (~17° apart,
    ~9% per-bit flip probability) — the whole point of probing the
    nearest flip-1 buckets instead of shrinking the code. Fully
    seeded, so the measured margin is deterministic."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal((100, 16))
    near = base + 0.3 * rng.standard_normal((100, 16))
    rows = [
        (i, [float(x) for x in v]) for i, v in enumerate(base)
    ] + [
        (1000 + i, [float(x) for x in v]) for i, v in enumerate(near)
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = corpus.filter(F.col("vec_id") < 1000)

    def recall(n_bits: int, probes: int) -> float:
        found = {
            r["qid"]: r["neighbor_id"]
            for r in knn.lsh_topk(
                corpus, queries, dim=16, k=1, n_bits=n_bits, probes=probes
            ).collect()
        }
        return sum(1 for q, n in found.items() if n == 1000 + q) / 100.0

    single = recall(n_bits=6, probes=1)
    multi = recall(n_bits=8, probes=4)
    assert multi > single, f"multi-probe {multi} <= single-probe {single}"
    assert multi >= 0.5, f"multi-probe recall@1 too low: {multi}"


def test_lsh_multiprobe_exact_bucket_first_and_distinct(spark):
    """The probe list starts with the exact bucket and contains no
    duplicates (each flip targets a distinct hyperplane)."""
    planes = knn.make_planes(8, 5, seed=3)
    df = spark.createDataFrame(
        [(1, [float(i) for i in range(8)])],
        "vec_id long, embedding array<double>",
    )
    row = df.select(
        knn._probe_buckets(F.col("embedding"), planes, probes=4).alias("b"),
        knn._srp_bits(F.col("embedding"), planes).alias("exact"),
    ).collect()[0]
    assert row["b"][0] == row["exact"]
    assert len(set(row["b"])) == 4
    # each probe differs from the exact bucket in exactly one bit
    for alt in row["b"][1:]:
        assert sum(a != b for a, b in zip(alt, row["b"][0])) == 1


def test_quadratic_anchor_guards_trip(spark):
    """The exactness anchors must fail fast on oversized inputs rather
    than silently running their quadratic plans (VERDICT r1 #7)."""
    from etl_lens_spark.dedup.embedding import cosine_pairs

    rows = [(i, [float(i), 1.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="O\\(n²\\)|max_rows"):
        cosine_pairs(df, tau=0.9, max_rows=5)
    with pytest.raises(ValueError, match="max_queries"):
        knn.brute_force_topk(df, df, k=1, max_queries=5)
    # under the cap both still run
    assert cosine_pairs(df, tau=0.999, max_rows=100).count() >= 0
    assert knn.brute_force_topk(df, df.limit(2), k=1, max_queries=5).count() == 2


def test_int8_quantization_cosine_error_bound(spark, sf_dir):
    """Cosine over dequantized int8 codes stays within 2% absolute of
    exact cosine on the fixture embeddings (symmetric scalar
    quantization bound), and the codes honor the int8 range."""
    from etl_lens_spark.similarity.quantize import dequantize, quantize_int8

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 60
    )
    q = quantize_int8(emb)
    a = q.filter(F.col("vec_id") < 30).select(
        F.col("vec_id").alias("ida"),
        F.col("embedding").alias("ea"),
        dequantize(F.col("qvec"), F.col("qscale")).alias("da"),
    )
    b = q.filter(F.col("vec_id") >= 30).select(
        F.col("vec_id").alias("idb"),
        F.col("embedding").alias("eb"),
        dequantize(F.col("qvec"), F.col("qscale")).alias("db"),
    )
    pairs = a.join(b, F.col("ida") == F.col("idb") - 30).select(
        knn.cosine_similarity(F.col("ea"), F.col("eb")).alias("exact"),
        knn.cosine_similarity(F.col("da"), F.col("db")).alias("approx"),
    ).collect()
    assert pairs
    for r in pairs:
        assert abs(r["exact"] - r["approx"]) < 0.02, r
    codes = q.select(F.explode("qvec").alias("c")).agg(
        F.min("c").alias("lo"), F.max("c").alias("hi")
    ).collect()[0]
    assert -127 <= codes["lo"] and codes["hi"] <= 127


def test_random_projection_preserves_distances(spark, sf_dir):
    """JL check: 64→32 projection preserves pairwise squared
    distances in expectation — per-pair relative error has std
    ~sqrt(2/32)≈0.25, so individual pairs can stray (worst fixture
    pair: ~0.6) while the MEAN error stays tight. Seeded, so the
    measured values are deterministic."""
    from etl_lens_spark.similarity.quantize import random_project

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 40
    )
    p = random_project(emb, dim=64, out_dim=32)

    def sqdist(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    a = p.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("ida"),
        _d(F.col("embedding")).alias("ea"),
        F.col("proj").alias("pa"),
    )
    b = p.filter(F.col("vec_id") >= 20).select(
        F.col("vec_id").alias("idb"),
        _d(F.col("embedding")).alias("eb"),
        F.col("proj").alias("pb"),
    )
    rows = a.join(b, F.col("ida") == F.col("idb") - 20).select(
        sqdist(F.col("ea"), F.col("eb")).alias("d_orig"),
        sqdist(F.col("pa"), F.col("pb")).alias("d_proj"),
    ).collect()
    assert rows
    rel = [abs(r["d_proj"] - r["d_orig"]) / r["d_orig"] for r in rows]
    sigma = (2 / 32) ** 0.5  # std of the per-pair JL estimator
    assert max(rel) < 3 * sigma, max(rel)
    # E|err| = sigma*sqrt(2/pi) ~= 0.20; allow 1.5x finite-sample slack
    assert sum(rel) / len(rel) < 1.5 * sigma * (2 / 3.14159) ** 0.5


def _d(col):
    return F.transform(col, lambda x: x.cast("double"))


def test_pq_topk_recall_vs_brute_force(spark, sf_dir):
    from etl_lens_spark.similarity import pq

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    bf = {
        (r["qid"], r["neighbor_id"])
        for r in knn.brute_force_topk(emb, queries, k=5).collect()
    }
    res = pq.pq_topk(
        emb, queries, dim=64, k=5, m=16, k_codes=32, train_iters=5
    ).collect()
    got = {(r["qid"], r["neighbor_id"]) for r in res}
    assert len(got) == len(bf)
    # shortlist-50 + exact re-rank: high recall even on the fixture's
    # near-random embeddings (ADC-only ranking tops out near 0.6 here)
    recall = len(got & bf) / len(bf)
    assert recall >= 0.9, f"PQ+rerank recall@5 too low: {recall}"
    # re-ranked similarities are EXACT cosine; ADC approximation within
    # a loose band of the truth
    bf_all = {
        (r["qid"], r["neighbor_id"]): r["cos_sim"]
        for r in knn.brute_force_topk(emb, queries, k=10**6).collect()
    }
    for r in res:
        exact = bf_all[(r["qid"], r["neighbor_id"])]
        assert exact == pytest.approx(r["cos_sim"], abs=1e-9)
        assert abs(r["approx_sim"] - exact) < 0.4, (
            f"ADC drifted: {r['approx_sim']} vs {exact}"
        )


def test_pq_encode_compresses_and_reconstructs(spark, sf_dir):
    import numpy as np

    from etl_lens_spark.similarity import pq

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq.train_codebooks(emb, dim=64, m=16, k_codes=32, iters=5)
    assert books.shape == (16, 32, 4)
    codes = pq.encode(emb, books).collect()
    assert all(len(r["codes"]) == 16 for r in codes)
    assert all(0 <= c < 32 for r in codes for c in r["codes"])
    # reconstruction from codes stays close to the normalized vector:
    # mean squared reconstruction error well under the unit norm
    raw = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    errs = []
    for r in codes[:100]:
        x = np.asarray(raw[r["vec_id"]], dtype=np.float64)
        x = x / np.linalg.norm(x)
        rec = np.concatenate(
            [books[mi, c] for mi, c in enumerate(r["codes"])]
        )
        errs.append(float(((x - rec) ** 2).sum()))
    assert sum(errs) / len(errs) < 0.5, sum(errs) / len(errs)


def test_pq_guard_and_validation(spark, sf_dir):
    import pytest as _pytest

    from etl_lens_spark.similarity import pq

    emb = load_table(spark, sf_dir, "embeddings")
    with _pytest.raises(ValueError, match="max_queries"):
        pq.pq_topk(emb, emb, dim=64, max_queries=10)
    with _pytest.raises(ValueError, match="not divisible"):
        pq.train_codebooks(emb, dim=64, m=7)


def test_ivf_maintained_index_drift_dial(spark):
    """Round-10 helpers behind sim_ann_incremental_cdf: a maintained
    cell index is never stale against its own SERVING centroids (the
    assignment is argmax against them), stale_fraction detects real
    drift against a different candidate matrix, and refine_centroids
    keeps centroid IDS aligned (each row moves toward the mean of
    its current members) so the comparison is well-defined."""
    import numpy as np

    from etl_lens_spark.similarity import ivf

    dim = 8
    ax0 = [1.0] + [0.0] * (dim - 1)
    ax1 = [0.0, 1.0] + [0.0] * (dim - 2)
    rows = []
    for i in range(20):
        v = list(ax0)
        v[2] = 0.05 * (i % 3)  # jitter off-axis, cluster 0
        rows.append((i, v))
    for i in range(20, 40):
        v = list(ax1)
        v[3] = 0.05 * (i % 3)  # cluster 1
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    serving = np.array([ax0, ax1])
    index = ivf.assign_cells(emb, serving)
    st = ivf.stale_fraction(index, serving).first()
    assert st["n_total"] == 40 and st["n_stale"] == 0
    # a candidate matrix with the rows SWAPPED: every vector is now
    # closer to a non-assigned centroid — full drift detected
    st2 = ivf.stale_fraction(index, serving[::-1].copy()).first()
    assert st2["n_stale"] == 40
    # one Lloyd step keeps ids aligned: centroid 0 still points at
    # cluster 0's mean, so staleness stays 0 against the refinement
    refined = ivf.refine_centroids(emb, serving)
    assert float(np.dot(refined[0], ax0)) > 0.9
    assert float(np.dot(refined[1], ax1)) > 0.9
    st3 = ivf.stale_fraction(index, refined).first()
    assert st3["n_stale"] == 0
