"""Sharded IVF tests: the distributed probe must equal single-device IVF
(same probed-cluster semantics) and, at nprobe == C, exact brute force —
all on the 8-virtual-device CPU mesh (SURVEY.md §4 fake-multichip setup).
"""

import numpy as np
import pytest

from irtpu.retrieval.ivf import IVFIndex
from irtpu.retrieval.knn import knn_search
from irtpu.parallel.mesh import create_mesh
from irtpu.parallel.sharded_ivf import ShardedIVF


def _corpus(n=4096, d=64, n_modes=16, seed=0):
    rng = np.random.RandomState(seed)
    modes = rng.randn(n_modes, d).astype(np.float32) * 4.0
    g = modes[rng.randint(n_modes, size=n)] + rng.randn(n, d).astype(
        np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    q = modes[rng.randint(n_modes, size=32)] + rng.randn(32, d).astype(
        np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return g.astype(np.float32), q.astype(np.float32)


def test_sharded_full_probe_equals_exact():
    g, q = _corpus()
    ivf = IVFIndex.build(g, n_clusters=16)
    sh = ShardedIVF(ivf)  # default mesh: gallery=8
    s, i = sh.search(q, k=10, nprobe=16)
    s_ex, i_ex = knn_search(g, q, k=10)
    np.testing.assert_array_equal(i, i_ex)
    np.testing.assert_allclose(s, s_ex, atol=1e-5)


def test_sharded_matches_single_device_ivf():
    g, q = _corpus(seed=3)
    ivf = IVFIndex.build(g, n_clusters=16)
    sh = ShardedIVF(ivf)
    for nprobe in (2, 5, 8):
        s1, i1 = ivf.search(q, k=10, nprobe=nprobe)
        s2, i2 = sh.search(q, k=10, nprobe=nprobe)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(s1, s2, atol=1e-5)


def test_sharded_pad_clusters():
    # C=13 not divisible by 8 shards -> pad clusters with length 0
    g, q = _corpus(seed=5)
    ivf = IVFIndex.build(g, n_clusters=13)
    sh = ShardedIVF(ivf)
    assert sh.centroids.shape[0] % 8 == 0
    s1, i1 = ivf.search(q, k=10, nprobe=13)
    s2, i2 = sh.search(q, k=10, nprobe=13)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-5)


@pytest.mark.parametrize("dtype", ["bf16", "int8"])
def test_sharded_compressed_partitions(dtype):
    g, q = _corpus(seed=7)
    ivf = IVFIndex.build(g, n_clusters=16, dtype=dtype)
    sh = ShardedIVF(ivf)
    s1, i1 = ivf.search(q, k=10, nprobe=16)
    s2, i2 = sh.search(q, k=10, nprobe=16)
    # compressed scoring is identical math on both paths
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-5)


def test_sharded_two_axis_mesh():
    g, q = _corpus(seed=9)
    ivf = IVFIndex.build(g, n_clusters=8)
    mesh = create_mesh([2, 4])  # data=2, gallery=4
    sh = ShardedIVF(ivf, mesh=mesh)
    s1, i1 = ivf.search(q, k=10, nprobe=8)
    s2, i2 = sh.search(q, k=10, nprobe=8)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-5)


def test_cli_query_ivf_sharded(tmp_path):
    from irtpu.cli import main

    g, q = _corpus(n=200, d=16, seed=13)
    np.save(tmp_path / "db.npy", g)
    np.save(tmp_path / "q.npy", q)
    main(["build-index", "--descriptors", str(tmp_path / "db.npy"),
          "--out", str(tmp_path / "idx.npz"), "--whitening", "none",
          "--ivf", "8"])
    main(["query", "--index", str(tmp_path / "idx.npz"),
          "--queries", str(tmp_path / "q.npy"), "-k", "5",
          "--ivf", str(tmp_path / "idx.ivf.npz"), "--nprobe", "8",
          "--sharded", "--out", str(tmp_path / "res.npz")])
    res = np.load(tmp_path / "res.npz")
    _, i_ex = knn_search(g, q, k=5)
    np.testing.assert_array_equal(res["indices"], np.asarray(i_ex))


def test_sharded_k_exceeds_probed_rows():
    # k larger than rows reachable through nprobe partitions: real rows
    # must match; overflow slots are NEG_INF fill on both paths
    g, q = _corpus(n=512, seed=11)
    ivf = IVFIndex.build(g, n_clusters=32)
    sh = ShardedIVF(ivf)
    s1, i1 = ivf.search(q, k=50, nprobe=2)
    s2, i2 = sh.search(q, k=50, nprobe=2)
    real = s1 > np.finfo(np.float32).min / 2
    np.testing.assert_array_equal(real, s2 > np.finfo(np.float32).min / 2)
    np.testing.assert_array_equal(i1[real], i2[real])
    np.testing.assert_allclose(s1[real], s2[real], atol=1e-5)


def test_sharded_k_beyond_probe_capacity_matches_single_device():
    """k >> nprobe*L: the sharded path must clamp exactly like
    IVFIndex.search instead of crashing in the merged top_k
    (round-3 review finding)."""
    rng = np.random.RandomState(17)
    g = rng.randn(512, 32).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    q = g[:4] + 0.01
    ivf = IVFIndex.build(g, n_clusters=32)
    L = ivf.partitions.shape[1]
    k = 8 * L  # far beyond nprobe=2 capacity
    s1, i1 = ivf.search(q, k=k, nprobe=2)
    s8, i8 = ShardedIVF(ivf).search(q, k=k, nprobe=2)
    assert s8.shape == s1.shape == (4, 2 * L)
    np.testing.assert_array_equal(i1, i8)
    np.testing.assert_allclose(s1, s8, atol=1e-5)
