"""Losses vs manual computation (reference semantics, SURVEY.md §2)."""

import numpy as np
import jax.numpy as jnp

from irtpu.ops import contrastive_loss, triplet_loss


def test_contrastive_manual():
    # one tuple: query, positive, one negative
    q = np.array([1.0, 0.0])
    p = np.array([0.8, 0.6])
    n = np.array([0.0, 1.0])
    desc = np.stack([q, p, n])[None]  # [1, 3, 2]
    labels = np.array([[0, 1, -1]])
    margin = 0.7
    dp = np.linalg.norm(q - p)
    dn = np.linalg.norm(q - n)
    want = 0.5 * dp**2 + 0.5 * max(0, margin - dn) ** 2
    got = float(contrastive_loss(jnp.asarray(desc), jnp.asarray(labels), margin))
    assert abs(got - want) < 1e-5


def test_contrastive_negative_beyond_margin_is_free():
    q = np.array([1.0, 0.0])
    n = -q  # distance 2 > margin
    desc = np.stack([q, q, n])[None]
    labels = np.array([[0, 1, -1]])
    got = float(contrastive_loss(jnp.asarray(desc), jnp.asarray(labels), 0.7))
    assert got < 1e-6  # positive at distance 0, negative free


def test_triplet_manual():
    q = np.array([1.0, 0.0])
    p = np.array([0.9, np.sqrt(1 - 0.81)])
    n = np.array([0.0, 1.0])
    desc = np.stack([q, p, n])[None]
    margin = 0.1
    dp2 = np.sum((q - p) ** 2)
    dn2 = np.sum((q - n) ** 2)
    want = max(0.0, margin + dp2 - dn2)
    got = float(triplet_loss(jnp.asarray(desc), margin))
    assert abs(got - want) < 1e-5


def test_losses_differentiable():
    import jax

    rng = np.random.RandomState(0)
    desc = rng.randn(2, 4, 8).astype(np.float32)
    labels = np.array([[0, 1, -1, -1], [0, 1, -1, -1]])
    g = jax.grad(lambda d: contrastive_loss(d, jnp.asarray(labels)))(jnp.asarray(desc))
    assert np.isfinite(np.asarray(g)).all()
    g2 = jax.grad(lambda d: triplet_loss(d))(jnp.asarray(desc))
    assert np.isfinite(np.asarray(g2)).all()
