"""PCA/whitening semantics tests — the exactness contract for the
rows-only ``emb_pca_whiten`` query: the distributed fit must equal a
single-machine numpy reference, the whitened sample covariance must be
the identity, and the Mahalanobis score must be invariant under an
orthogonal re-basis of the input (the property that makes it a sound
curation signal regardless of the embedding model's arbitrary
rotation)."""

from __future__ import annotations

import numpy as np
import pytest

from etl_lens_spark.similarity.pca import apply_whiten, fit_pca


def _toy_df(spark, X):
    rows = [(i, row.tolist()) for i, row in enumerate(X)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(4)


@pytest.fixture(scope="module")
def toy(spark):
    rng = np.random.default_rng(7)
    # anisotropic, correlated, non-zero-mean data
    A = rng.normal(size=(6, 6))
    X = rng.normal(size=(400, 6)) @ A + rng.normal(size=6) * 3
    return X, _toy_df(spark, X)


def test_fit_matches_numpy_reference(toy):
    X, df = toy
    model = fit_pca(df)
    assert model["n"] == len(X)
    np.testing.assert_allclose(model["mean"], X.mean(axis=0), atol=1e-9)
    ref_cov = np.cov(X, rowvar=False, bias=True)
    np.testing.assert_allclose(model["cov"], ref_cov, atol=1e-9)
    ref_eig = np.sort(np.linalg.eigvalsh(ref_cov))[::-1]
    np.testing.assert_allclose(model["eigvals"], ref_eig, atol=1e-9)


def test_whitened_covariance_is_identity(toy):
    X, df = toy
    model = fit_pca(df, eps=0.0)
    z = apply_whiten(df, model, keep=["vec_id"]).orderBy("vec_id")
    Z = np.stack([r["z"] for r in z.collect()])
    cov_z = np.cov(Z, rowvar=False, bias=True)
    np.testing.assert_allclose(cov_z, np.eye(X.shape[1]), atol=1e-8)


def test_mahalanobis_invariant_under_rotation(spark, toy):
    X, df = toy
    # random orthogonal re-basis of the same data
    rng = np.random.default_rng(13)
    Q, _ = np.linalg.qr(rng.normal(size=(6, 6)))
    Xr = X @ Q
    m1 = fit_pca(df, eps=0.0)
    m2 = fit_pca(_toy_df(spark, Xr), eps=0.0)
    z1 = apply_whiten(df, m1, keep=["vec_id"]).orderBy("vec_id")
    z2 = apply_whiten(_toy_df(spark, Xr), m2, keep=["vec_id"]).orderBy(
        "vec_id"
    )
    s1 = np.array([sum(v * v for v in r["z"]) for r in z1.collect()])
    s2 = np.array([sum(v * v for v in r["z"]) for r in z2.collect()])
    np.testing.assert_allclose(s1, s2, atol=1e-7)
    # mean Mahalanobis² equals the dimension for the fitted sample
    assert abs(s1.mean() - X.shape[1]) < 1e-6


def test_partitioning_does_not_change_fit(spark, toy):
    X, _ = toy
    a = fit_pca(_toy_df(spark, X).coalesce(1))
    b = fit_pca(_toy_df(spark, X).repartition(7))
    np.testing.assert_allclose(a["cov"], b["cov"], atol=1e-10)
    np.testing.assert_allclose(a["whiten"], b["whiten"], atol=1e-8)


def test_fit_rejects_empty(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        fit_pca(df)


def test_procrustes_recovers_planted_rotation(spark):
    from etl_lens_spark.queries import all_queries

    r = all_queries()["emb_procrustes_align"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert r.d == 64 and r.n_vecs > 0
    # noise-free planted rotation must be recovered to float precision
    assert r.rotation_recovery_err < 1e-10
    assert r.orthogonality_err < 1e-10
    assert r.mean_residual < 1e-10


def test_frequent_directions_bound_and_validity(spark):
    from etl_lens_spark.queries import all_queries

    r = all_queries()["emb_frequent_directions_sketch"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert r.bound_holds
    assert r.spectral_err >= 0
    assert r.spectral_err <= r.fd_bound + 1e-9
    assert r.ell == 16 and r.d == 64
    # the sketch must actually compress: err strictly positive but
    # well under the worst-case bound on real data
    assert r.spectral_err < r.fd_bound
