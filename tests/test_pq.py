"""PQ / IVF-PQ tests: ADC reconstruction-exactness, recall corridors on
clustered corpora, the refine stage's exact-ranking guarantee, persistence,
and the deterministic tie/sentinel contracts (SURVEY.md §4 oracle style).
"""

import numpy as np
import pytest

from irtpu.retrieval.ivf import IVFIndex
from irtpu.retrieval.knn import knn_search
from irtpu.retrieval.pq import IVFPQIndex, PQIndex, _build_luts, _encode

import jax.numpy as jnp


def _corpus(n=4096, d=64, n_modes=16, nq=32, seed=0):
    rng = np.random.RandomState(seed)
    modes = rng.randn(n_modes, d).astype(np.float32) * 4.0
    g = modes[rng.randint(n_modes, size=n)] + rng.randn(n, d).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    q = modes[rng.randint(n_modes, size=nq)] + rng.randn(nq, d).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return g.astype(np.float32), q.astype(np.float32)


def _recall(i_approx, i_exact, k):
    return np.mean(
        [len(set(a[:k]) & set(b[:k])) / k for a, b in zip(i_approx, i_exact)]
    )


def test_adc_scores_reconstruction_exactly():
    # ADC is EXACT inner-product scoring of the PQ reconstruction: search
    # scores must equal <q, x_hat> computed by hand from the codebooks
    g, q = _corpus(n=512, d=32)
    pq = PQIndex.build(g, m=8, kmeans_iters=10)
    s, i = pq.search(q, k=5)
    M, V, ds = pq.codebooks.shape
    recon = pq.codebooks[np.arange(M)[None], pq.codes.astype(int)]  # [N,M,ds]
    recon = recon.reshape(g.shape[0], -1)
    want = q @ recon.T  # [nq, N]
    got_want = np.take_along_axis(want, i, axis=1)
    np.testing.assert_allclose(s, got_want, atol=1e-4)


def test_adc_tie_contract_lower_row_wins():
    # duplicate rows -> identical reconstructions -> exact ADC ties; the
    # streaming merge must keep lower-index-wins (NumPy stable argsort)
    g, q = _corpus(n=256, d=32, seed=2)
    g = np.concatenate([g[:128], g[:128]])  # rows i and i+128 identical
    pq = PQIndex.build(g, m=8, kmeans_iters=10)
    s, i = pq.search(q, k=8)
    M = pq.codebooks.shape[0]
    recon = pq.codebooks[np.arange(M)[None], pq.codes.astype(int)]
    recon = recon.reshape(g.shape[0], -1)
    want_s = q @ recon.T
    want_i = np.argsort(-want_s, axis=1, kind="stable")[:, :8]
    np.testing.assert_array_equal(i, want_i)


def test_pq_recall_corridor():
    # measured corridors (CPU, this corpus): raw ADC ordering inside tight
    # unit-norm clusters is quantization-noise-bound (the standard PQ
    # behavior refinement exists for) — m=16 raw@10 0.228, refine=400
    # (~10% of N) 1.000; m=32 refine=100 0.966
    g, q = _corpus(n=4096, d=64)
    _, i_ex = knn_search(g, q, k=10)
    i_ex = np.asarray(i_ex)
    pq = PQIndex.build(g, m=16)  # 16x compression at d=64
    _, i_pq = pq.search(q, k=10)
    assert _recall(i_pq, i_ex, 10) > 0.15
    s_r, i_r = pq.search(q, k=10, refine=400, gallery=g)
    assert _recall(i_r, i_ex, 10) > 0.95
    # refined scores are TRUE inner products of the returned rows
    true = np.take_along_axis(q @ g.T, i_r, axis=1)
    np.testing.assert_allclose(s_r, true, atol=1e-4)
    # doubling code bytes tightens the raw corridor
    pq32 = PQIndex.build(g, m=32)
    _, i32 = pq32.search(q, k=10, refine=100, gallery=g)
    assert _recall(i32, i_ex, 10) > 0.9


def test_refine_equals_exact_when_candidates_cover():
    # when the ADC cut keeps the true top-k (refine ~ N), refined results
    # ARE exact search, ties included
    g, q = _corpus(n=512, d=32, seed=4)
    pq = PQIndex.build(g, m=8)
    s_ex, i_ex = knn_search(g, q, k=10)
    s_r, i_r = pq.search(q, k=10, refine=512, gallery=g)
    np.testing.assert_array_equal(i_r, np.asarray(i_ex))
    np.testing.assert_allclose(s_r, np.asarray(s_ex), atol=1e-5)


def test_pq_chunking_invariance():
    g, q = _corpus(n=1000, d=32, seed=5)
    pq = PQIndex.build(g, m=8)
    s1, i1 = pq.search(q, k=10, chunk=64)
    s2, i2 = pq.search(q, k=10, chunk=1000)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-5)


def test_encode_nearest_codebook_entry():
    g, _ = _corpus(n=256, d=32, seed=6)
    pq = PQIndex.build(g, m=4, kmeans_iters=10)
    codes = np.asarray(_encode(jnp.asarray(pq.codebooks), jnp.asarray(g)))
    M, V, ds = pq.codebooks.shape
    sub = g.reshape(-1, M, ds)
    for j in range(M):
        d2 = ((sub[:, j, None, :] - pq.codebooks[j][None]) ** 2).sum(-1)
        np.testing.assert_array_equal(codes[:, j], np.argmin(d2, axis=1))


def test_pq_save_load_roundtrip(tmp_path):
    g, q = _corpus(n=512, d=32, seed=7)
    pq = PQIndex.build(g, m=8)
    pq.save(str(tmp_path / "pq.npz"))
    pq2 = PQIndex.load(str(tmp_path / "pq.npz"))
    s1, i1 = pq.search(q, k=5)
    s2, i2 = pq2.search(q, k=5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2)
    assert pq2.n == pq.n


def test_luts_match_manual():
    g, q = _corpus(n=256, d=32, seed=8)
    pq = PQIndex.build(g, m=4, kmeans_iters=5)
    lut = np.asarray(_build_luts(jnp.asarray(pq.codebooks), jnp.asarray(q)))
    M, V, ds = pq.codebooks.shape
    qs = q.reshape(len(q), M, ds)
    want = np.einsum("qms,mvs->qmv", qs, pq.codebooks)
    np.testing.assert_allclose(lut, want, atol=1e-5)


# ---------------------------------------------------------------------------
# IVF-PQ
# ---------------------------------------------------------------------------


def test_ivfpq_recall_and_refine():
    g, q = _corpus(n=4096, d=64)
    _, i_ex = knn_search(g, q, k=10)
    i_ex = np.asarray(i_ex)
    ivf = IVFIndex.build(g, n_clusters=16)
    ivfpq = IVFPQIndex.from_ivf(ivf, m=16)
    # full probe + generous refine ~ exact
    s, i = ivfpq.search(q, k=10, nprobe=16, refine=200, gallery=g)
    assert _recall(i, i_ex, 10) > 0.95
    true = np.take_along_axis(q @ g.T, i, axis=1)
    np.testing.assert_allclose(s, true, atol=1e-4)
    # partial probe still lands in the corridor
    _, i4 = ivfpq.search(q, k=10, nprobe=4, refine=200, gallery=g)
    assert _recall(i4, i_ex, 10) > 0.85


def test_ivfpq_residual_bias():
    # IVF-PQ score = coarse + residual ADC: must equal <q, centroid + r_hat>
    g, q = _corpus(n=512, d=32, seed=9)
    ivf = IVFIndex.build(g, n_clusters=8)
    ivfpq = IVFPQIndex.from_ivf(ivf, m=8, kmeans_iters=10)
    s, i = ivfpq.search(q, k=5, nprobe=8)
    M, V, ds = ivfpq.codebooks.shape
    C, L, _ = ivfpq.codes.shape
    recon = ivfpq.codebooks[
        np.arange(M)[None, None, None], ivfpq.codes.astype(int)
    ].reshape(C, L, -1)
    full = recon + ivf.centroids[:, None, :]  # [C, L, D] reconstruction
    # map returned global rows back to their (c, l) slot scores
    flat_rows = ivfpq.row_ids.reshape(-1)
    valid = (np.arange(L)[None] < ivfpq.lengths[:, None]).reshape(-1)
    row2flat = np.full(ivfpq.n, -1, np.int64)
    row2flat[flat_rows[valid]] = np.nonzero(valid)[0]
    want_full = q @ full.reshape(C * L, -1).T  # [nq, C*L]
    want = np.take_along_axis(want_full, row2flat[i], axis=1)
    np.testing.assert_allclose(s, want, atol=1e-4)


def test_ivfpq_under_filled_probe_sentinels():
    # k beyond reachable rows -> NEG_INF fill with sentinel rows, never
    # duplicated real rows (the refine-duplication regression)
    g, q = _corpus(n=512, d=32, seed=11)
    ivf = IVFIndex.build(g, n_clusters=32)
    ivfpq = IVFPQIndex.from_ivf(ivf, m=8)
    s, i = ivfpq.search(q, k=64, nprobe=2, refine=64, gallery=g)
    real = s > np.finfo(np.float32).min / 2
    for row_i, row_real in zip(i, real):
        rows = row_i[row_real]
        assert len(set(rows.tolist())) == len(rows), "duplicate rows in top-k"


def test_ivfpq_rejects_compressed_ivf():
    g, _ = _corpus(n=512, d=32, seed=12)
    ivf = IVFIndex.build(g, n_clusters=8, dtype="int8")
    with pytest.raises(ValueError, match="f32 partitions"):
        IVFPQIndex.from_ivf(ivf, m=8)


def test_ivfpq_save_load_roundtrip(tmp_path):
    g, q = _corpus(n=512, d=32, seed=13)
    ivf = IVFIndex.build(g, n_clusters=8)
    ivfpq = IVFPQIndex.from_ivf(ivf, m=8)
    ivfpq.save(str(tmp_path / "ivfpq.npz"))
    back = IVFPQIndex.load(str(tmp_path / "ivfpq.npz"))
    s1, i1 = ivfpq.search(q, k=5, nprobe=8)
    s2, i2 = back.search(q, k=5, nprobe=8)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2)


# ---------------------------------------------------------------------------
# OPQ: learned orthogonal rotation
# ---------------------------------------------------------------------------


def _aniso_corpus(n=4000, d=32, seed=0):
    """Anisotropic spectrum under a dense random rotation — the case a
    fixed subspace split handles worst and OPQ exists to fix."""
    rng = np.random.RandomState(seed)
    eigs = 1.0 / np.arange(1, d + 1)
    Q, _ = np.linalg.qr(rng.randn(d, d))
    return ((rng.randn(n, d) * np.sqrt(eigs)) @ Q).astype(np.float32)


def test_opq_rotation_orthogonal_and_better_fit():
    from irtpu.retrieval.pq import _decode

    x = _aniso_corpus()
    plain = PQIndex.build(x, m=8)
    opq = PQIndex.build(x, m=8, opq_iters=10)
    assert opq.rotation is not None and plain.rotation is None
    d = x.shape[1]
    np.testing.assert_allclose(opq.rotation @ opq.rotation.T, np.eye(d),
                               atol=1e-5)
    mse = lambda pq: np.mean(np.sum((
        (x if pq.rotation is None else x @ pq.rotation)
        - _decode(pq.codebooks, pq.codes)) ** 2, axis=1))
    # measured 0.283 -> 0.259 on this corpus; corridor with slack
    assert mse(opq) < 0.97 * mse(plain), (mse(opq), mse(plain))


def test_opq_refine_uses_unrotated_space():
    """Full refine must return TRUE inner products (original space) and
    the exact ranking — guards the q-rotated-into-rescore bug class."""
    x = _aniso_corpus(n=300)
    q = x[:7] + 0.01
    opq = PQIndex.build(x, m=8, opq_iters=4)
    s, i = opq.search(q, k=5, refine=300, gallery=x)
    es = q @ x.T
    want = np.argsort(-es, axis=1, kind="stable")[:, :5]
    np.testing.assert_array_equal(i, want)
    np.testing.assert_allclose(
        s, np.take_along_axis(es, want, axis=1), rtol=1e-4, atol=1e-5)


def test_opq_save_load_roundtrip(tmp_path):
    x = _aniso_corpus(n=300)
    opq = PQIndex.build(x, m=8, opq_iters=3)
    p = str(tmp_path / "o.pq.npz")
    opq.save(p)
    back = PQIndex.load(p)
    np.testing.assert_array_equal(back.rotation, opq.rotation)
    q = x[:4]
    np.testing.assert_array_equal(opq.search(q, k=5)[1],
                                  back.search(q, k=5)[1])


def test_opq_sharded_matches_single_device():
    from irtpu.parallel.sharded_pq import ShardedPQ

    x = _aniso_corpus(n=301)  # not divisible by 8
    q = x[:6] + 0.01
    opq = PQIndex.build(x, m=8, opq_iters=3)
    s1, i1 = opq.search(q, k=9)
    s8, i8 = ShardedPQ(opq).search(q, k=9)
    np.testing.assert_array_equal(i1, i8)
    np.testing.assert_array_equal(s1, s8)


def test_opq_ivfpq_residual_rotation():
    """OPQ over IVF residuals: coarse probing unchanged (original space),
    LUT scoring in the rotated space; ADC score decomposes exactly as
    coarse + <qR, decode(codes)>, and full probe + full refine == exact."""
    from irtpu.retrieval.ivf import IVFIndex
    from irtpu.retrieval.pq import IVFPQIndex, _decode

    x = _aniso_corpus(n=400, d=32, seed=4)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = x[:6] + 0.01
    ivf = IVFIndex.build(x, n_clusters=5)
    opq = IVFPQIndex.from_ivf(ivf, m=8, opq_iters=4)
    assert opq.rotation is not None

    # score decomposition on one query against its best cluster's rows
    cs = q @ ivf.centroids.T
    c = int(np.argmax(cs[0]))
    L = opq.codes.shape[1]
    valid = int(ivf.lengths[c])
    dec = _decode(opq.codebooks, opq.codes[c].reshape(L, -1))[:valid]
    want = cs[0, c] + (q[0] @ opq.rotation) @ dec.T
    s, r = opq.search(q[:1], k=min(5, valid), nprobe=1)
    rows_in_c = ivf.row_ids[c, :valid]
    order = np.argsort(-want, kind="stable")[: s.shape[1]]
    np.testing.assert_allclose(s[0], want[order], atol=1e-4)
    np.testing.assert_array_equal(r[0], rows_in_c[order])

    # full probe + full refine == exact brute force
    es = q @ x.T
    want_i = np.argsort(-es, axis=1, kind="stable")[:, :5]
    _, i2 = opq.search(q, k=5, nprobe=5, refine=400, gallery=x)
    np.testing.assert_array_equal(i2, want_i)


def test_opq_ivfpq_save_load(tmp_path):
    from irtpu.retrieval.ivf import IVFIndex
    from irtpu.retrieval.pq import IVFPQIndex, load_pq_artifact

    x = _aniso_corpus(n=300, d=32, seed=5)
    ivf = IVFIndex.build(x, n_clusters=4)
    opq = IVFPQIndex.from_ivf(ivf, m=8, opq_iters=3)
    p = str(tmp_path / "o.ivfpq.npz")
    opq.save(p)
    back = load_pq_artifact(p)
    assert isinstance(back, IVFPQIndex)
    np.testing.assert_array_equal(back.rotation, opq.rotation)
    q = x[:4]
    np.testing.assert_array_equal(opq.search(q, k=5, nprobe=4)[1],
                                  back.search(q, k=5, nprobe=4)[1])


def test_ivfpq_refine_k_beyond_probe_capacity():
    """k > nprobe*L with refine must clamp like the unrefined path, not
    crash in the rescore top_k (round-3 review finding)."""
    g, q = _corpus(n=512, d=32, seed=13)
    ivf = IVFIndex.build(g, n_clusters=32)
    ivfpq = IVFPQIndex.from_ivf(ivf, m=8)
    L = ivfpq.codes.shape[1]
    k = 2 * L + 20  # exceeds the nprobe=2 probe capacity
    s, i = ivfpq.search(q, k=k, nprobe=2, refine=10, gallery=g)
    assert s.shape == (q.shape[0], 2 * L)
    # fill contract: never a fabricated row id
    assert (i[s <= np.finfo(np.float32).min / 2] == -1).all()


def test_pq_fill_contract_rows_minus_one():
    """IVF under-fill returns row -1, not duplicate row 0 / int32-max."""
    g, q = _corpus(n=256, d=32, seed=14)
    ivf = IVFIndex.build(g, n_clusters=32)
    L = ivf.partitions.shape[1]
    s, i = ivf.search(q, k=2 * L, nprobe=2)
    fill = s <= np.finfo(np.float32).min / 2
    if fill.any():
        assert (i[fill] == -1).all()
    for row_i, row_f in zip(i, ~fill):
        rows = row_i[row_f]
        assert len(set(rows.tolist())) == len(rows)

def test_opq_pca_init_recall_uplift_on_normalized_descriptors():
    """OPQ must EARN its bytes (VERDICT r3 weak #6): on L2-normalized
    anisotropic descriptors (the retrieval regime) the PCA-permutation-
    initialized alternation beats plain PQ at equal bytes in recall@10,
    not just reconstruction MSE. Measured on this corpus: recall@10
    0.419 (PQ) -> 0.520 (OPQ), MSE 0.228 -> 0.156; corridor with slack.

    Guards the fill-level bug in the eigenvalue allocation: comparing
    log-products across buckets of different sizes cascades the largest
    eigenvalues into ONE bucket (all-sub-1 eigenvalues make every
    assignment more attractive), which measured WORSE than plain PQ
    (recall@10 0.30)."""
    from irtpu.retrieval.pq import _decode, _opq_pca_permutation_init

    x = _aniso_corpus(n=5200, d=64, seed=0)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    g, q = x[:5000], x[5000:]
    es = q @ g.T
    true10 = np.argsort(-es, axis=1)[:, :10]

    def recall10(pq):
        idx = pq.search(q, k=10)[1]
        hits = sum(len(set(idx[i]) & set(true10[i])) for i in range(len(q)))
        return hits / (len(q) * 10)

    plain = PQIndex.build(g, m=8)
    opq = PQIndex.build(g, m=8, opq_iters=10)
    r_plain, r_opq = recall10(plain), recall10(opq)
    assert r_opq > r_plain + 0.04, (r_plain, r_opq)

    def mse(pq):
        xr = g if pq.rotation is None else g @ pq.rotation
        return float(np.mean(np.sum(
            (xr - _decode(pq.codebooks, pq.codes)) ** 2, axis=1)))

    assert mse(opq) < 0.8 * mse(plain), (mse(opq), mse(plain))

    # the init itself: orthogonal, and balanced bucket allocation (no
    # bucket hoards the top eigenvalues)
    R = _opq_pca_permutation_init(g, 8)
    np.testing.assert_allclose(R @ R.T, np.eye(64), atol=1e-4)
    xr = (g - g.mean(0)) @ R
    bucket_var = xr.reshape(len(g), 8, 8).var(axis=(0, 2))
    # fill-level-aware greedy keeps the max/min LOG-variance spread well
    # inside the cascade regime (cascade puts ~all variance in bucket 0)
    assert bucket_var.max() / bucket_var.min() < 50, bucket_var
