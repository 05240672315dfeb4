"""Sharded PQ: distributed ADC top-k == single-device PQ, bitwise.

Runs on the virtual 8-device CPU mesh (tests/conftest.py)."""

import numpy as np
import pytest
from jax.sharding import Mesh

import jax

from irtpu.parallel.sharded_pq import ShardedPQ
from irtpu.retrieval.pq import PQIndex


def _mesh(n=8, axis="gallery"):
    return Mesh(np.array(jax.devices()[:n]), (axis,))


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.RandomState(11)
    g = rng.randn(333, 64).astype(np.float32)  # deliberately not %8
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    q = g[rng.choice(333, 16, replace=False)] + 0.05 * rng.randn(
        16, 64).astype(np.float32)
    pq = PQIndex.build(g, m=8)
    return g, q, pq


def test_sharded_adc_matches_single_device(corpus):
    g, q, pq = corpus
    s1, i1 = pq.search(q, k=10)
    spq = ShardedPQ(pq, mesh=_mesh())
    s8, i8 = spq.search(q, k=10)
    np.testing.assert_array_equal(i1, i8)
    np.testing.assert_array_equal(s1, s8)


def test_sharded_adc_tie_contract():
    """Duplicate rows across shard boundaries: lower global row wins."""
    rng = np.random.RandomState(3)
    base = rng.randn(40, 32).astype(np.float32)
    g = np.concatenate([base, base])  # every row duplicated across shards
    pq = PQIndex.build(g, m=4)
    q = base[:6]
    s1, i1 = pq.search(q, k=12)
    s8, i8 = ShardedPQ(pq, mesh=_mesh()).search(q, k=12)
    np.testing.assert_array_equal(i1, i8)
    np.testing.assert_array_equal(s1, s8)


def test_sharded_refine_equals_exact(corpus):
    """Full-depth refinement against the host gallery == exact search."""
    from irtpu.retrieval.knn import streaming_topk

    g, q, pq = corpus
    import jax.numpy as jnp

    es, ei = streaming_topk(jnp.asarray(g), jnp.asarray(q), k=10)
    spq = ShardedPQ(pq, mesh=_mesh())
    s, i = spq.search(q, k=10, refine=g.shape[0], gallery=g)
    np.testing.assert_array_equal(np.asarray(ei), i)
    np.testing.assert_allclose(np.asarray(es), s, atol=1e-5)


def test_sharded_refine_requires_gallery(corpus):
    _, q, pq = corpus
    with pytest.raises(ValueError, match="gallery"):
        ShardedPQ(pq, mesh=_mesh()).search(q, k=5, refine=50)


def test_sharded_small_k_gt_local_rows():
    """k larger than any single shard's row count still merges globally."""
    rng = np.random.RandomState(5)
    g = rng.randn(24, 16).astype(np.float32)  # 3 rows/shard on 8 devices
    pq = PQIndex.build(g, m=4)
    q = g[:4]
    s1, i1 = pq.search(q, k=20)
    s8, i8 = ShardedPQ(pq, mesh=_mesh()).search(q, k=20)
    np.testing.assert_array_equal(i1, i8)
    np.testing.assert_array_equal(s1, s8)
