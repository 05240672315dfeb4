"""In-kernel streamed matmul + exact top-k (ops.pallas.fused_topk).

Interpret mode on CPU computes scores in exact f32, so results must be
BITWISE-identical to NumPy stable argsort over the same score matrix —
including adversarial duplicate galleries (the tie contract of
retrieval.knn)."""

import numpy as np
import jax.numpy as jnp

from irtpu.ops.pallas.fused_topk import fused_topk_search


def _np_topk(gallery, queries, k):
    scores = queries @ gallery.T
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


def test_matches_numpy_stable_argsort():
    rng = np.random.RandomState(0)
    g = rng.randn(1500, 64).astype(np.float32)
    q = rng.randn(16, 64).astype(np.float32)
    s, i = fused_topk_search(jnp.asarray(g), jnp.asarray(q), k=100, ch=512)
    ws, wi = _np_topk(g, q, 100)
    np.testing.assert_array_equal(np.asarray(i), wi)
    np.testing.assert_allclose(np.asarray(s), ws, rtol=1e-5)


def test_adversarial_ties_heavy_duplicates():
    rng = np.random.RandomState(1)
    # 25x duplicated rows spanning chunk boundaries: identical scores, and
    # the lower gallery index must win every tie
    g = np.repeat(rng.randn(48, 16).astype(np.float32), 25, axis=0)
    q = rng.randn(9, 16).astype(np.float32)
    s, i = fused_topk_search(jnp.asarray(g), jnp.asarray(q), k=64, ch=256)
    ws, wi = _np_topk(g, q, 64)
    np.testing.assert_array_equal(np.asarray(i), wi)


def test_integer_scores_all_ties():
    rng = np.random.RandomState(2)
    g = rng.randint(0, 3, size=(700, 8)).astype(np.float32)
    q = rng.randint(0, 3, size=(5, 8)).astype(np.float32)
    s, i = fused_topk_search(jnp.asarray(g), jnp.asarray(q), k=128, ch=256)
    ws, wi = _np_topk(g, q, 128)
    np.testing.assert_array_equal(np.asarray(i), wi)


def test_ragged_gallery_and_query_padding():
    rng = np.random.RandomState(3)
    g = rng.randn(1000 + 37, 32).astype(np.float32)  # not a chunk multiple
    q = rng.randn(11, 32).astype(np.float32)         # not a tile multiple
    s, i = fused_topk_search(jnp.asarray(g), jnp.asarray(q), k=50, ch=512)
    ws, wi = _np_topk(g, q, 50)
    np.testing.assert_array_equal(np.asarray(i), wi)
    # padded gallery rows must never appear
    assert np.asarray(i).max() < g.shape[0]


def test_matches_streaming_topk():
    from irtpu.retrieval.knn import knn_search

    rng = np.random.RandomState(4)
    g = rng.randn(2000, 48).astype(np.float32)
    q = rng.randn(8, 48).astype(np.float32)
    s1, i1 = fused_topk_search(jnp.asarray(g), jnp.asarray(q), k=100)
    s2, i2 = knn_search(jnp.asarray(g), jnp.asarray(q), k=100)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)


def test_k_above_lane_limit_rejected():
    g = np.zeros((10, 8), np.float32)
    q = np.zeros((2, 8), np.float32)
    try:
        fused_topk_search(jnp.asarray(g), jnp.asarray(q), k=129)
    except ValueError as e:
        assert "k <= 128" in str(e)
    else:
        raise AssertionError("expected ValueError for k > 128")


def test_bf16_gallery_exact_ties_vs_bf16_oracle():
    # bf16 gallery: scores are bf16-product/f32-accumulate; compare against
    # an oracle computed the same way
    rng = np.random.RandomState(5)
    g = rng.randn(600, 32).astype(np.float32)
    q = rng.randn(4, 32).astype(np.float32)
    gb = jnp.asarray(g, jnp.bfloat16)
    qb = jnp.asarray(q, jnp.bfloat16)
    s, i = fused_topk_search(gb, jnp.asarray(q), k=30, ch=256)
    ref = np.asarray(
        jnp.einsum("qd,gd->qg", qb.astype(jnp.float32), gb.astype(jnp.float32))
    )
    wi = np.argsort(-ref, axis=1, kind="stable")[:, :30]
    np.testing.assert_array_equal(np.asarray(i), wi)
