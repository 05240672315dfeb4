"""NetVLAD aggregation vs a direct NumPy oracle."""

import numpy as np
import jax.numpy as jnp

from irtpu.ops import netvlad_aggregate


def _oracle(x, centroids, W, b, mask=None):
    B, N, C = x.shape
    K = centroids.shape[0]
    logits = x @ W + b
    e = np.exp(logits - logits.max(axis=-1, keepdims=True))
    a = e / e.sum(axis=-1, keepdims=True)
    if mask is not None:
        a = a * mask[..., None]
    vlad = np.einsum("bnk,bnc->bkc", a, x) - a.sum(axis=1)[..., None] * centroids
    vlad = vlad / (np.linalg.norm(vlad, axis=-1, keepdims=True) + 1e-6)
    vlad = vlad.reshape(B, K * C)
    return vlad / (np.linalg.norm(vlad, axis=-1, keepdims=True) + 1e-6)


def test_matches_oracle():
    rng = np.random.RandomState(0)
    B, N, C, K = 2, 50, 16, 8
    x = rng.randn(B, N, C).astype(np.float32)
    c = rng.randn(K, C).astype(np.float32)
    W = rng.randn(C, K).astype(np.float32)
    b = rng.randn(K).astype(np.float32)
    got = np.asarray(netvlad_aggregate(jnp.asarray(x), jnp.asarray(c), jnp.asarray(W), jnp.asarray(b)))
    np.testing.assert_allclose(got, _oracle(x, c, W, b), rtol=1e-4, atol=1e-5)


def test_masked_equals_truncated():
    rng = np.random.RandomState(1)
    B, N, C, K = 1, 40, 8, 4
    x = rng.randn(B, N, C).astype(np.float32)
    c = rng.randn(K, C).astype(np.float32)
    W = rng.randn(C, K).astype(np.float32)
    b = np.zeros(K, np.float32)
    mask = np.zeros((B, N), np.float32)
    mask[:, :25] = 1
    got = np.asarray(
        netvlad_aggregate(jnp.asarray(x), jnp.asarray(c), jnp.asarray(W), jnp.asarray(b), mask=jnp.asarray(mask))
    )
    want = np.asarray(
        netvlad_aggregate(jnp.asarray(x[:, :25]), jnp.asarray(c), jnp.asarray(W), jnp.asarray(b))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_accepts_4d_spatial_input():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 5, 6, 8).astype(np.float32)
    c = rng.randn(4, 8).astype(np.float32)
    W = rng.randn(8, 4).astype(np.float32)
    got = np.asarray(netvlad_aggregate(jnp.asarray(x), jnp.asarray(c), jnp.asarray(W)))
    assert got.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, atol=1e-4)
