"""MXU one-hot ADC kernel tests (ops/pallas/adc_mxu.py).

CPU runs exercise the kernel in interpret mode through the same
``backend='mxu'`` code path production uses on TPU; hardware rates and
the 2.7x verdict live in the module docstring + PERF.md.
"""

import numpy as np
import jax
import jax.numpy as jnp

from irtpu.ops.pallas import adc_mxu
from irtpu.retrieval.pq import PQIndex, _build_luts, adc_topk_core


def _setup(n=1100, d=64, m=8, nq=40, seed=0):
    rng = np.random.RandomState(seed)
    books = rng.randn(m, 256, d // m).astype(np.float32)
    codes = rng.randint(0, 256, size=(n, m), dtype=np.uint8)
    q = rng.randn(nq, d).astype(np.float32)
    lut = np.asarray(_build_luts(jnp.asarray(books), jnp.asarray(q)))
    return jnp.asarray(lut), jnp.asarray(codes)


def test_prepare_lut_tables_bf16x2_near_f32():
    lut, _ = _setup()
    hi, lo = adc_mxu.prepare_lut_tables(lut)
    nq, m, v = lut.shape
    t = np.asarray(lut).transpose(1, 2, 0).reshape(m * v, nq)
    back = np.asarray(hi, np.float32)[:, :nq] + np.asarray(lo, np.float32)[:, :nq]
    # bf16x2 carries ~16 mantissa bits: rel err well under 1e-4
    np.testing.assert_allclose(back, t, rtol=1e-4, atol=1e-5)
    assert hi.shape[1] % 128 == 0 and hi.dtype == jnp.bfloat16


def test_adc_scores_mxu_matches_onehot_matmul():
    lut, codes = _setup(n=1024)
    hi, lo = adc_mxu.prepare_lut_tables(lut)
    s = np.asarray(adc_mxu.adc_scores_mxu(codes, hi, lo, interpret=True))
    nq, m, v = lut.shape
    # reference: exact gather of the f32 LUT
    l_np = np.asarray(lut)
    want = l_np[:, np.arange(m)[None, :], np.asarray(codes).astype(int)].sum(-1)
    np.testing.assert_allclose(s[:, :nq], want.T, rtol=2e-5, atol=2e-3)


def test_adc_topk_core_mxu_equals_gather():
    lut, codes = _setup()
    gs, gi = jax.jit(
        lambda l, c: adc_topk_core(l, c, k=10, chunk=512, backend="gather")
    )(lut, codes)
    ms, mi = jax.jit(
        lambda l, c: adc_topk_core(l, c, k=10, chunk=512, backend="mxu")
    )(lut, codes)
    # random data: no near-ties at bf16x2 resolution -> identical rows
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(mi))
    np.testing.assert_allclose(np.asarray(gs), np.asarray(ms),
                               rtol=2e-5, atol=2e-3)


def test_adc_topk_core_mxu_masking_and_offset():
    lut, codes = _setup(n=900)
    n_valid, off = 700, 12345
    gs, gi = adc_topk_core(lut, codes, k=7, chunk=512, n_valid=n_valid,
                           index_offset=off, backend="gather")
    ms, mi = adc_topk_core(lut, codes, k=7, chunk=512, n_valid=n_valid,
                           index_offset=off, backend="mxu")
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(mi))
    assert np.asarray(mi).min() >= off
    assert np.asarray(mi).max() < off + n_valid


def test_recommend_backend_shape_gates():
    # tiny query batches and over-VMEM batches stay on the gather path
    assert adc_mxu.recommend_backend(nq=8, n=100_000, m=64) == "gather"
    assert adc_mxu.recommend_backend(nq=256, n=100_000, m=64) == "mxu"
    assert adc_mxu.recommend_backend(nq=1024, n=100_000, m=64) == "gather"
    assert adc_mxu.recommend_backend(nq=256, n=1000, m=64) == "gather"


def test_pq_search_backend_kwarg():
    # the public search accepts backend= and mxu agrees with gather
    rng = np.random.RandomState(3)
    g = rng.randn(1024, 32).astype(np.float32)
    q = rng.randn(16, 32).astype(np.float32)
    pq = PQIndex.build(g, m=4, kmeans_iters=8)
    sg, ig = pq.search(q, k=5, backend="gather")
    sm, im = pq.search(q, k=5, backend="mxu")
    np.testing.assert_array_equal(ig, im)
    np.testing.assert_allclose(sg, sm, rtol=2e-5, atol=2e-3)
