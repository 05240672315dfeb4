"""IVF approximate-search tests: exactness at nprobe=C, recall corridor,
pad masking under all-negative scores, chunk invariance, persistence."""

import numpy as np
import pytest

from irtpu.retrieval.ivf import IVFIndex
from irtpu.retrieval.knn import knn_search

from test_query_expansion import _clustered


def _rand(n=400, d=32, seed=0):
    rng = np.random.RandomState(seed)
    g = rng.randn(n, d).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    q = rng.randn(16, d).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return g, q


def test_full_probe_equals_exact():
    g, q = _rand()
    ivf = IVFIndex.build(g, n_clusters=10)
    s_ex, i_ex = knn_search(g, q, k=10)
    s, i = ivf.search(q, k=10, nprobe=10)
    np.testing.assert_array_equal(i, np.asarray(i_ex))
    np.testing.assert_allclose(s, np.asarray(s_ex), atol=1e-5)


def test_recall_corridor_clustered():
    """Measured corridors (see PERF.md): at C=8 on the 8-cluster corpus,
    recall@10 = 0.62/0.77/0.90 for nprobe 1/2/4 and exactly 1.0 at full
    probe; recall must be monotone in nprobe."""
    g, gl, q, ql = _clustered(n_clusters=8, per=50, d=64, noise=0.3)
    ivf = IVFIndex.build(g, n_clusters=8)
    _, i_ex = knn_search(g, q, k=10)

    def recall(nprobe):
        _, i_ap = ivf.search(q, k=10, nprobe=nprobe)
        return np.mean([
            len(set(a) & set(b)) / 10.0
            for a, b in zip(np.asarray(i_ex), i_ap)
        ])

    r = {p: recall(p) for p in (1, 2, 4, 8)}
    assert r[1] >= 0.50 and r[2] >= 0.70 and r[4] >= 0.85, r
    assert r[8] == 1.0, r
    assert r[1] <= r[2] <= r[4] <= r[8], r


def test_pad_rows_never_returned():
    """All true scores negative (anti-correlated query): zero-pad rows
    would win if unmasked. Returned rows must be valid and distinct."""
    rng = np.random.RandomState(3)
    base = rng.randn(12, 16).astype(np.float32)  # only 12 rows: the k=10
    base /= np.linalg.norm(base, axis=1, keepdims=True)  # tail IS negative
    q = -base[:2]
    ivf = IVFIndex.build(base, n_clusters=4)
    s, i = ivf.search(q, k=10, nprobe=4)
    # some true top-10 scores are negative: an unmasked zero-pad row
    # would displace them and break the exactness check below
    assert (s < 0).any()
    for row in i:
        assert len(set(row.tolist())) == 10
        assert ((row >= 0) & (row < 12)).all()
    # and still exact at full probe
    _, i_ex = knn_search(base, q, k=10)
    np.testing.assert_array_equal(i, np.asarray(i_ex))


def test_chunk_invariance():
    g, q = _rand(n=300, d=24, seed=5)
    ivf = IVFIndex.build(g, n_clusters=9)
    s1, i1 = ivf.search(q, k=5, nprobe=4, chunk=3)
    s2, i2 = ivf.search(q, k=5, nprobe=4, chunk=64)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-6)


def test_save_load_roundtrip(tmp_path):
    g, q = _rand(n=200, d=16, seed=7)
    ivf = IVFIndex.build(g, n_clusters=8)
    path = str(tmp_path / "ivf.npz")
    ivf.save(path)
    back = IVFIndex.load(path)
    s1, i1 = ivf.search(q, k=5, nprobe=3)
    s2, i2 = back.search(q, k=5, nprobe=3)
    np.testing.assert_array_equal(i1, i2)
    assert back.n == 200 and back.pad_ratio >= 1.0


def test_balanced_build_bounds_pad_ratio():
    """Skewed data (one dominant mode): natural assignment pads heavily,
    balance=1.3 caps it; full-probe search stays exact either way."""
    rng = np.random.RandomState(0)
    big = rng.randn(300, 16) * 0.05 + rng.randn(16)  # 75% in one mode
    rest = rng.randn(100, 16)
    g = np.concatenate([big, rest]).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    q = g[:8] + 0.01

    nat = IVFIndex.build(g, n_clusters=8, balance=None)
    bal = IVFIndex.build(g, n_clusters=8, balance=1.3)
    assert bal.pad_ratio <= 1.3 + 1e-6 < nat.pad_ratio, (
        nat.pad_ratio, bal.pad_ratio)
    _, i_ex = knn_search(g, q, k=10)
    for ivf in (nat, bal):
        _, i = ivf.search(q, k=10, nprobe=8)
        np.testing.assert_array_equal(i, np.asarray(i_ex))


def test_cli_build_and_query_ivf(tmp_path):
    from irtpu.cli import main

    g, q = _rand(n=150, d=16, seed=11)
    np.save(tmp_path / "db.npy", g)
    np.save(tmp_path / "q.npy", q)
    main(["build-index", "--descriptors", str(tmp_path / "db.npy"),
          "--out", str(tmp_path / "idx.npz"), "--whitening", "none",
          "--ivf", "6"])
    assert (tmp_path / "idx.ivf.npz").exists()
    main(["query", "--index", str(tmp_path / "idx.npz"),
          "--queries", str(tmp_path / "q.npy"), "-k", "5",
          "--ivf", str(tmp_path / "idx.ivf.npz"), "--nprobe", "6",
          "--out", str(tmp_path / "res.npz")])
    res = np.load(tmp_path / "res.npz")
    _, i_ex = knn_search(g, q, k=5)
    np.testing.assert_array_equal(res["indices"], np.asarray(i_ex))


def test_k_clamped_to_probed_rows():
    g, q = _rand(n=50, d=16, seed=9)
    ivf = IVFIndex.build(g, n_clusters=25)  # tiny partitions
    s, i = ivf.search(q, k=40, nprobe=2)  # probed rows < k
    assert i.shape[0] == q.shape[0] and i.shape[1] <= 40


def test_int8_full_probe_matches_quantized_oracle():
    """int8 partitions: full probe equals a NumPy oracle over the SAME
    /127-quantized values (products and <2^24 sums are exact in f32, so
    equality is bitwise, incl. (score desc, row asc) tie order)."""
    g, q = _rand(n=300, d=32, seed=2)
    ivf = IVFIndex.build(g, n_clusters=10, dtype="int8")
    s, i = ivf.search(q, k=10, nprobe=10)
    qg = np.clip(np.round(g * 127.0), -127, 127).astype(np.float32)
    oracle = (q @ qg.T) / 127.0
    i_ex = np.argsort(-oracle, axis=1, kind="stable")[:, :10]
    np.testing.assert_array_equal(i, i_ex)
    np.testing.assert_allclose(
        s, np.take_along_axis(oracle, i_ex, axis=1), atol=1e-6)


def test_bf16_full_probe_on_separated_data():
    """bf16 partitions: on data whose neighbor score gaps dwarf bf16
    rounding (~4e-3), full probe returns the exact-f32 ranking."""
    rng = np.random.RandomState(4)
    g = rng.randn(200, 16).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    q = g[[5, 50, 150]] + 0.001  # self-match dominates
    ivf = IVFIndex.build(g, n_clusters=8, dtype="bf16")
    _, i = ivf.search(q, k=5, nprobe=8)
    _, i_ex = knn_search(g, q, k=5)
    # top-1 must always match; deeper ranks only where the f64 gap
    # exceeds bf16 input-rounding noise
    np.testing.assert_array_equal(i[:, 0], np.asarray(i_ex)[:, 0])
    s64 = g.astype(np.float64) @ q.astype(np.float64).T
    for r in range(q.shape[0]):
        for c in range(5):
            a, b = int(np.asarray(i_ex)[r, c]), int(i[r, c])
            if a != b:
                assert abs(s64[a, r] - s64[b, r]) < 8e-3, (r, c, a, b)


def test_compressed_save_load_roundtrip(tmp_path):
    g, q = _rand(n=150, d=16, seed=8)
    for dt in ("bf16", "int8"):
        ivf = IVFIndex.build(g, n_clusters=6, dtype=dt)
        p = str(tmp_path / f"ivf_{dt}.npz")
        ivf.save(p)
        back = IVFIndex.load(p)
        assert back.dtype == dt
        assert back.partitions.dtype == ivf.partitions.dtype
        s1, i1 = ivf.search(q, k=5, nprobe=6)
        s2, i2 = back.search(q, k=5, nprobe=6)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(s1, s2)
