"""Distributed top-k == single-device top-k, bitwise (SURVEY.md §4).

Runs on the virtual 8-device CPU platform (conftest sets
xla_force_host_platform_device_count=8).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from irtpu.parallel import create_mesh, ShardedIndex
from irtpu.retrieval import knn_search, Index
from irtpu.utils.config import IndexConfig


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
    return create_mesh([1, 8])


def test_sharded_equals_single_device(mesh):
    rng = np.random.RandomState(0)
    g = rng.randn(512, 32).astype(np.float32)
    q = rng.randn(9, 32).astype(np.float32)

    s1, i1 = knn_search(jnp.asarray(g), jnp.asarray(q), k=13)

    si = ShardedIndex(g, mesh=mesh)
    s2, i2 = si.query(q, k=13)

    np.testing.assert_array_equal(np.asarray(i1), i2)
    np.testing.assert_allclose(np.asarray(s1), s2, rtol=1e-6)


def test_sharded_with_padding(mesh):
    # gallery size not divisible by 8: pad rows must never appear in results
    rng = np.random.RandomState(1)
    g = rng.randn(101, 16).astype(np.float32) - 5.0  # negative scores likely
    q = rng.randn(4, 16).astype(np.float32)
    si = ShardedIndex(g, mesh=mesh)
    s, i = si.query(q, k=20)
    assert (i < 101).all()
    s1, i1 = knn_search(jnp.asarray(g), jnp.asarray(q), k=20)
    np.testing.assert_array_equal(np.asarray(i1), i)


def test_sharded_tie_breaking(mesh):
    # identical rows land on different shards; global lower index must win
    g = np.zeros((64, 8), np.float32)
    g[3] = g[35] = [1, 0, 0, 0, 0, 0, 0, 0]  # shards 0 and 4
    q = np.array([[1, 0, 0, 0, 0, 0, 0, 0]], np.float32)
    si = ShardedIndex(g, mesh=mesh)
    s, i = si.query(q, k=2)
    assert i[0, 0] == 3 and i[0, 1] == 35


def test_sharded_index_from_whitened_index(mesh):
    rng = np.random.RandomState(2)
    g = rng.randn(80, 24).astype(np.float32)
    q = rng.randn(3, 24).astype(np.float32)
    idx = Index.build(g, IndexConfig(whitening="pca"))
    si = ShardedIndex.from_index(idx, mesh=mesh)
    s1, i1 = idx.query(q, k=7)
    s2, i2 = si.query(q, k=7)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-6)


def test_sharded_2d_mesh_data_and_gallery():
    """Gallery sharding composes with a nontrivial data axis (2x4 mesh)."""
    mesh2 = create_mesh([2, 4])
    rng = np.random.RandomState(3)
    g = rng.randn(256, 16).astype(np.float32)
    q = rng.randn(6, 16).astype(np.float32)
    si = ShardedIndex(g, mesh=mesh2)
    s, i = si.query(q, k=9)
    s1, i1 = knn_search(jnp.asarray(g), jnp.asarray(q), k=9)
    np.testing.assert_array_equal(np.asarray(i1), i)
