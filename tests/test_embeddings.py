"""PCA operator tests: kernel correctness against numpy SVD ground
truth, bit-parity of the np/expr projection forms, sample-fit vs local
twin, moments-fit agreement, whitening, and the IVF-on-PCA composition."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from ncbi_analysis_spark.operators import embeddings as em
from ncbi_analysis_spark.operators import similarity_search as ss


def _mat(n=300, d=12, seed=7):
    """Anisotropic synthetic data: variance concentrated in a few axes
    so top-k recovery is well-conditioned."""
    rng = np.random.RandomState(seed)
    scales = np.linspace(4.0, 0.1, d)
    basis = np.linalg.qr(rng.standard_normal((d, d)))[0]
    X = (rng.standard_normal((n, d)) * scales) @ basis.T + rng.standard_normal(d)
    return X


def _df(spark, X):
    rows = [(i, [float(x) for x in X[i]]) for i in range(X.shape[0])]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_pca_np_matches_svd_subspace():
    X = _mat()
    mean, comps, eig = em._pca_np(X, k=4)
    assert np.allclose(mean, X.mean(axis=0))
    # ground truth via SVD of the centered matrix
    Xc = X - X.mean(axis=0)
    _, s, Vt = np.linalg.svd(Xc, full_matrices=False)
    true_eig = (s**2) / X.shape[0]
    assert np.allclose(eig, true_eig[:4], rtol=1e-8)
    # axes match up to sign; sign is pinned to largest-|x| positive
    for j in range(4):
        assert abs(abs(np.dot(comps[j], Vt[j])) - 1.0) < 1e-8
        i = int(np.argmax(np.abs(comps[j])))
        assert comps[j][i] > 0


def test_pca_eigenvalues_descending_and_bounds():
    X = _mat()
    _, _, eig = em._pca_np(X, k=6)
    assert all(eig[i] >= eig[i + 1] for i in range(5))
    assert all(e >= 0 for e in eig)
    total = np.trace(np.cov(X.T, bias=True))
    evr = em.explained_variance_ratio(eig, total)
    assert 0 < evr.sum() <= 1 + 1e-9


def test_pca_fit_spark_matches_local_twin(spark, tmp_path):
    X = _mat(n=150)
    df = _df(spark, X)
    p = str(tmp_path / "emb.parquet")
    df.write.parquet(p)
    m1, c1, e1 = em.pca_fit(df, k=3, sample_cap=100)
    m2, c2, e2 = em.pca_fit_local(p, k=3, sample_cap=100)
    # bit-identical: same md5-ordered sample, same kernel
    assert m1.tobytes() == m2.tobytes()
    assert c1.tobytes() == c2.tobytes()
    assert e1.tobytes() == e2.tobytes()


def test_pca_fit_moments_agrees_with_full_sample_fit(spark):
    X = _mat(n=400)
    df = _df(spark, X).repartition(5)
    m1, c1, e1 = em.pca_fit(df, k=3, sample_cap=10**6)  # cap > n: all rows
    m2, c2, e2 = em.pca_fit_moments(df, k=3)
    assert np.allclose(m1, m2, atol=1e-9)
    assert np.allclose(e1, e2, rtol=1e-7)
    for j in range(3):
        assert abs(abs(np.dot(c1[j], c2[j])) - 1.0) < 1e-7


def test_pca_project_np_expr_bit_identical(spark):
    X = _mat(n=120)
    df = _df(spark, X)
    mean, comps, eig = em._pca_np(X, k=4)
    a = em.pca_project(df, mean, comps, method="np").collect()
    b = em.pca_project(df, mean, comps, method="expr").collect()
    pa = {r["vec_id"]: r["proj"] for r in a}
    pb = {r["vec_id"]: r["proj"] for r in b}
    assert pa.keys() == pb.keys()
    for k_ in pa:
        assert [x for x in pa[k_]] == [x for x in pb[k_]]  # exact floats


def test_pca_project_values_match_numpy(spark):
    X = _mat(n=80)
    df = _df(spark, X)
    mean, comps, _ = em._pca_np(X, k=3)
    got = {r["vec_id"]: np.array(r["proj"])
           for r in em.pca_project(df, mean, comps, method="np").collect()}
    want = (X - mean) @ comps.T
    for i in range(X.shape[0]):
        assert np.allclose(got[i], want[i], atol=1e-9)


def test_pca_whiten_unit_variance(spark):
    X = _mat(n=500, seed=11)
    df = _df(spark, X)
    mean, comps, eig = em.pca_fit(df, k=4, sample_cap=10**6)
    proj = em.pca_project(
        df, mean, comps, whiten=True, eigenvalues=eig
    ).collect()
    P = np.array([r["proj"] for r in proj])
    v = P.var(axis=0)
    assert np.allclose(v, 1.0, atol=0.02)


def test_pca_reconstruction_error_decreases_with_k():
    X = _mat(n=250)
    errs = []
    for k in (1, 3, 6, 12):
        mean, comps, _ = em._pca_np(X, k=k)
        P = (X - mean) @ comps.T
        R = P @ comps + mean
        errs.append(float(((X - R) ** 2).sum()))
    assert errs == sorted(errs, reverse=True)
    assert errs[-1] < 1e-18  # k = d: exact reconstruction


def test_pca_validation_errors(spark):
    X = _mat(n=20, d=4)
    df = _df(spark, X)
    with pytest.raises(ValueError):
        em._pca_np(X, k=0)
    with pytest.raises(ValueError):
        em._pca_np(X, k=5)
    with pytest.raises(ValueError):
        em.pca_project(df, np.zeros(3), np.zeros((2, 4)))
    with pytest.raises(ValueError):
        em.pca_project(df, np.zeros(4), np.zeros((2, 4)), whiten=True)


def test_ivf_on_pca_recall(spark):
    """Composition: IVF search in PCA space finds most of the exact
    full-dim neighbors — the reduced index is usable, not just well-
    typed."""
    rng = np.random.RandomState(3)
    n, d, r = 240, 16, 6
    # intrinsically rank-r data (+ tiny noise): the k=r reduction is
    # near-lossless, so exact full-dim neighborhoods must survive
    Z = rng.standard_normal((n, r)) * np.linspace(3.0, 1.0, r)
    W = np.linalg.qr(rng.standard_normal((d, r)))[0].T
    X = Z @ W + 0.01 * rng.standard_normal((n, d))
    df = _df(spark, X)
    mean, comps, eig = em.pca_fit(df, k=6, sample_cap=10**6)
    proj = em.pca_project(df, mean, comps).withColumnRenamed(
        "proj", "embedding"
    )
    q = proj.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    qf = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    exact = ss.brute_force_topk(df, qf, k=10).collect()
    cents = ss.train_ivf_centroids(proj, k=6, sample_cap=10**6)
    red = ss.ivf_topk(proj, q, cents, k=10, nprobe=3).collect()
    exact_sets: dict = {}
    for r in exact:
        exact_sets.setdefault(r["q_id"], set()).add(r["vec_id"])
    hit = tot = 0
    for r in red:
        tot += 1
        hit += r["vec_id"] in exact_sets[r["q_id"]]
    assert tot > 0 and hit / tot >= 0.6
