"""Exact kNN: parity with NumPy argsort including ties and chunking."""

import numpy as np
import jax.numpy as jnp

from irtpu.retrieval import knn_search, full_ranks


def _np_topk(gallery, queries, k):
    scores = queries @ gallery.T
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


def test_matches_numpy():
    rng = np.random.RandomState(0)
    g = rng.randn(500, 32).astype(np.float32)
    q = rng.randn(7, 32).astype(np.float32)
    s, i = knn_search(jnp.asarray(g), jnp.asarray(q), k=10)
    ws, wi = _np_topk(g, q, 10)
    np.testing.assert_array_equal(np.asarray(i), wi)
    np.testing.assert_allclose(np.asarray(s), ws, rtol=1e-5)


def test_chunking_invariance():
    rng = np.random.RandomState(1)
    g = rng.randn(1000, 16).astype(np.float32)
    q = rng.randn(3, 16).astype(np.float32)
    s1, i1 = knn_search(jnp.asarray(g), jnp.asarray(q), k=25, chunk=64)
    s2, i2 = knn_search(jnp.asarray(g), jnp.asarray(q), k=25, chunk=1000)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)


def test_tie_breaking_lower_index_wins():
    # duplicate gallery rows -> identical scores; stable argsort picks the
    # lower index first, and so must we (SURVEY.md §7 hard parts).
    g = np.zeros((6, 4), np.float32)
    g[1] = g[4] = [1, 0, 0, 0]
    g[2] = g[5] = [0.5, 0, 0, 0]
    q = np.array([[1, 0, 0, 0]], np.float32)
    s, i = knn_search(jnp.asarray(g), jnp.asarray(q), k=4, chunk=2)
    ws, wi = _np_topk(g, q, 4)
    np.testing.assert_array_equal(np.asarray(i), wi)


def test_k_larger_than_gallery_clamped():
    g = np.eye(3, 8, dtype=np.float32)
    q = np.eye(2, 8, dtype=np.float32)
    s, i = knn_search(jnp.asarray(g), jnp.asarray(q), k=10)
    assert i.shape == (2, 3)
    assert i[0, 0] == 0 and i[1, 0] == 1


def test_full_ranks_matches_numpy():
    rng = np.random.RandomState(2)
    g = rng.randn(50, 8).astype(np.float32)
    q = rng.randn(5, 8).astype(np.float32)
    ranks = full_ranks(g, q, batch=2)
    want = np.argsort(-(q @ g.T), axis=1, kind="stable").T
    np.testing.assert_array_equal(ranks, want)


def test_blockmax_topk_exact_vs_numpy():
    from irtpu.retrieval.knn import blockmax_topk
    import jax

    rng = np.random.RandomState(7)
    s = rng.randn(9, 5000).astype(np.float32)
    got_s, got_i = jax.jit(lambda x: blockmax_topk(x, 37))(jnp.asarray(s))
    want_i = np.argsort(-s, axis=1, kind="stable")[:, :37]
    np.testing.assert_array_equal(np.asarray(got_i), want_i)


def test_blockmax_topk_adversarial_ties():
    from irtpu.retrieval.knn import blockmax_topk

    # many duplicated values spanning block boundaries
    rng = np.random.RandomState(8)
    base = rng.randint(0, 5, size=(4, 2000)).astype(np.float32)  # heavy ties
    got_s, got_i = blockmax_topk(jnp.asarray(base), 50)
    want_i = np.argsort(-base, axis=1, kind="stable")[:, :50]
    np.testing.assert_array_equal(np.asarray(got_i), want_i)


def test_blockmax_topk_k_exceeds_blocks():
    from irtpu.retrieval.knn import blockmax_topk

    rng = np.random.RandomState(9)
    s = rng.randn(2, 600).astype(np.float32)  # 5 blocks of 128, k=200 > nb
    got_s, got_i = blockmax_topk(jnp.asarray(s), 200)
    want_i = np.argsort(-s, axis=1, kind="stable")[:, :200]
    np.testing.assert_array_equal(np.asarray(got_i), want_i)


def test_knn_search_ties_heavy_duplicates():
    rng = np.random.RandomState(10)
    g = np.repeat(rng.randn(40, 8).astype(np.float32), 25, axis=0)  # 1000 rows, 25x dup
    q = rng.randn(6, 8).astype(np.float32)
    s, i = knn_search(jnp.asarray(g), jnp.asarray(q), k=60, chunk=256)
    ws, wi = _np_topk(g, q, 60)
    np.testing.assert_array_equal(np.asarray(i), wi)


def test_storage_dtypes_recall():
    from irtpu.retrieval import Index
    from irtpu.utils.config import IndexConfig

    rng = np.random.RandomState(20)
    g = rng.randn(2000, 128).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    q = rng.randn(16, 128).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    base = Index.build(g, IndexConfig(whitening=None, storage="float32"))
    _, want = base.query(q, k=10)

    for storage, min_recall in (("bfloat16", 0.95), ("int8", 0.8)):
        idx = Index.build(g, IndexConfig(whitening=None, storage=storage))
        assert idx.device_gallery().dtype == {"bfloat16": jnp.bfloat16, "int8": jnp.int8}[storage]
        s, got = idx.query(q, k=10)
        recall = np.mean([len(set(got[i]) & set(want[i])) / 10 for i in range(16)])
        assert recall >= min_recall, (storage, recall)
        # int8 scores are rescaled to cosine range
        assert np.abs(s).max() <= 1.01


def test_storage_persists(tmp_path):
    from irtpu.retrieval import Index
    from irtpu.utils.config import IndexConfig

    rng = np.random.RandomState(21)
    g = rng.randn(50, 16).astype(np.float32)
    idx = Index.build(g, IndexConfig(whitening=None, storage="int8"))
    idx.save(str(tmp_path / "i.npz"))
    loaded = Index.load(str(tmp_path / "i.npz"))
    assert loaded.storage == "int8"


def test_external_gallery_mmap_roundtrip(tmp_path):
    """save(external_gallery=True): uncompressed sidecar loads back
    memory-mapped and queries identically to the in-npz layout."""
    from irtpu.retrieval.index import Index
    from irtpu.utils.config import IndexConfig

    rng = np.random.RandomState(44)
    g = rng.randn(80, 32).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    index = Index.build(g, IndexConfig(whitening="pca"))
    q = g[:5] + 0.01

    p1 = str(tmp_path / "inline.npz")
    p2 = str(tmp_path / "ext.npz")
    index.save(p1)
    index.save(p2, external_gallery=True)
    assert (tmp_path / "ext.gallery.npy").exists()

    a = Index.load(p1)
    b = Index.load(p2)
    assert isinstance(b.gallery, np.memmap)
    s1, i1 = a.query(q, k=7)
    s2, i2 = b.query(q, k=7)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-6)


def test_noncontiguous_and_wide_gallery_save(tmp_path):
    """Non-native-dtype galleries that are SLICED (non-contiguous last
    axis) or 8-byte wide must still save: .view() demands a contiguous
    minor axis and the bit-view map needs an itemsize-8 entry (ADVICE r4).
    float64 is in the native list, so the 8-byte case uses a f64 slice
    viewed through the fallback path via a sliced bf16 gallery + a
    contiguity check on the wide dtype."""
    import ml_dtypes

    from irtpu.retrieval.index import Index

    rng = np.random.RandomState(46)
    g = rng.randn(40, 64).astype(ml_dtypes.bfloat16)
    sliced = g[::2, :32]  # non-contiguous view
    assert not sliced.flags["C_CONTIGUOUS"]
    index = Index(gallery=sliced, storage="bfloat16")
    p = str(tmp_path / "sliced.npz")
    index.save(p)  # used to raise: .view() on a non-contiguous array
    loaded = Index.load(p)
    np.testing.assert_array_equal(
        np.asarray(loaded.gallery).view(np.uint16),
        np.ascontiguousarray(sliced).view(np.uint16))


def test_bf16_gallery_persists_losslessly(tmp_path):
    """A bfloat16 HOST gallery must round-trip through save/load (inline
    and mmap sidecar): the npy format silently degrades ml_dtypes bfloat16
    to void16 ('|V2'), which made saved config-5 artifacts unloadable —
    the loader now bit-views via meta['gallery_dtype']."""
    import ml_dtypes

    from irtpu.retrieval.index import Index

    rng = np.random.RandomState(45)
    g = rng.randn(60, 32).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    g16 = g.astype(ml_dtypes.bfloat16)
    index = Index(gallery=g16, storage="bfloat16")
    q = g[:4] + 0.01

    for ext in (False, True):
        p = str(tmp_path / f"bf16_{ext}.npz")
        index.save(p, external_gallery=ext)
        loaded = Index.load(p)
        assert loaded.gallery.dtype == ml_dtypes.bfloat16
        np.testing.assert_array_equal(
            loaded.gallery.view(np.uint16), g16.view(np.uint16))
        s1, i1 = index.query(q, k=5)
        s2, i2 = loaded.query(q, k=5)
        np.testing.assert_array_equal(i1, i2)


def test_fused_single_dispatch_query_matches_staged():
    """Index.query's fused serving path (whiten+score+select in one jitted
    program, round-5) must return exactly what the staged path returns:
    same whiten_apply, same single-chunk scoring, same stable blockmax —
    across whitening on/off, non-power-of-two Nq (pad bucket), and k."""
    from irtpu.retrieval import Index, knn_search
    from irtpu.utils.config import IndexConfig

    rng = np.random.RandomState(31)
    g = rng.randn(800, 64).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    q = rng.randn(5, 64).astype(np.float32)  # 5 -> pads to bucket 8

    for whitening in (None, "pca"):
        idx = Index.build(g.copy(), IndexConfig(whitening=whitening))
        s_f, i_f = idx.query(q, k=13)
        # staged reference: transform + knn_search, the pre-fusion pipeline
        qw = jnp.asarray(idx.transform_queries(q))
        s_r, i_r = knn_search(idx.device_gallery(), qw, k=13)
        np.testing.assert_array_equal(i_f, np.asarray(i_r))
        np.testing.assert_allclose(s_f, np.asarray(s_r), rtol=1e-6, atol=1e-7)
        assert s_f.shape == (5, 13)


def test_fused_query_int8_storage_cosine_scale():
    """The fused path inherits score_matrix's int8 dequant-and-rescale."""
    from irtpu.retrieval import Index
    from irtpu.utils.config import IndexConfig

    rng = np.random.RandomState(32)
    g = rng.randn(300, 32).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    q = g[:4] + rng.randn(4, 32).astype(np.float32) * 0.01
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    idx = Index.build(g, IndexConfig(whitening=None, storage="int8"))
    s, i = idx.query(q, k=3)
    assert np.abs(s).max() <= 1.01
    assert (i[:, 0] == np.arange(4)).mean() >= 0.75
