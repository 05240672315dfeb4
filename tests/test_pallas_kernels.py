"""Pallas kernels vs their jnp oracles (interpret mode on CPU; SURVEY.md §7.6)."""

import numpy as np
import jax.numpy as jnp

from irtpu.ops import gem, l2n, netvlad_aggregate
from irtpu.ops.pallas import gem_l2n_fused, netvlad_fused


def test_gem_l2n_fused_matches_oracle():
    rng = np.random.RandomState(0)
    x = rng.rand(2, 8, 8, 128).astype(np.float32)
    p = 3.0
    got = np.asarray(gem_l2n_fused(jnp.asarray(x), p, interpret=True))
    want = np.asarray(l2n(gem(jnp.asarray(x), p)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_gem_l2n_fused_chunked():
    rng = np.random.RandomState(1)
    x = rng.rand(1, 10, 13, 128).astype(np.float32)  # 130 positions, chunk 64
    got = np.asarray(gem_l2n_fused(jnp.asarray(x), 2.5, chunk=64, interpret=True))
    want = np.asarray(l2n(gem(jnp.asarray(x), 2.5)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_gem_l2n_fused_learnable_p_array():
    rng = np.random.RandomState(2)
    x = rng.rand(3, 4, 4, 128).astype(np.float32)
    p = jnp.asarray(3.7, jnp.float32)
    got = np.asarray(gem_l2n_fused(jnp.asarray(x), p, interpret=True))
    want = np.asarray(l2n(gem(jnp.asarray(x), p)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_gem_l2n_fused_grad_matches_xla_head():
    """custom VJP: grads of the fused kernel == grads of l2n(gem(.))."""
    import jax

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.rand(2, 6, 7, 128).astype(np.float32))
    p = jnp.asarray(3.0, jnp.float32)
    # scalar losses so we can compare full gradients
    w = jnp.asarray(rng.randn(2, 128).astype(np.float32))

    def loss_fused(x, p):
        return jnp.sum(gem_l2n_fused(x, p, interpret=True) * w)

    def loss_oracle(x, p):
        return jnp.sum(l2n(gem(x, p)) * w)

    (dx_f, dp_f) = jax.grad(loss_fused, argnums=(0, 1))(x, p)
    (dx_o, dp_o) = jax.grad(loss_oracle, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(dx_f), np.asarray(dx_o), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(dp_f), float(dp_o), rtol=1e-4, atol=1e-6)


def test_gem_l2n_fused_rect_grad_matches_masked_oracle():
    import jax
    from irtpu.ops.pallas import gem_l2n_fused_rect

    rng = np.random.RandomState(12)
    B, H, W, C = 3, 6, 8, 128
    x = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    sizes = jnp.asarray([[6, 8], [4, 5], [3, 8]], jnp.int32)
    p = jnp.asarray(2.5, jnp.float32)
    wv = jnp.asarray(rng.randn(B, C).astype(np.float32))
    mask = np.zeros((B, H, W), bool)
    for i, (h, w) in enumerate(np.asarray(sizes)):
        mask[i, :h, :w] = True

    def loss_fused(x, p):
        return jnp.sum(gem_l2n_fused_rect(x, p, sizes, interpret=True) * wv)

    def loss_oracle(x, p):
        return jnp.sum(l2n(gem(x, p, mask=jnp.asarray(mask))) * wv)

    (dx_f, dp_f) = jax.grad(loss_fused, argnums=(0, 1))(x, p)
    (dx_o, dp_o) = jax.grad(loss_oracle, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(dx_f), np.asarray(dx_o), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(dp_f), float(dp_o), rtol=1e-4, atol=1e-6)


def test_netvlad_fused_matches_oracle():
    rng = np.random.RandomState(3)
    B, N, C, K = 2, 96, 128, 8
    x = rng.randn(B, N, C).astype(np.float32)
    c = rng.randn(K, C).astype(np.float32)
    W = (rng.randn(C, K) * 0.1).astype(np.float32)
    b = rng.randn(K).astype(np.float32)
    got = np.asarray(
        netvlad_fused(jnp.asarray(x), jnp.asarray(c), jnp.asarray(W), jnp.asarray(b), interpret=True)
    )
    want = np.asarray(
        netvlad_aggregate(jnp.asarray(x), jnp.asarray(c), jnp.asarray(W), jnp.asarray(b))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_netvlad_fused_chunked_and_masked():
    rng = np.random.RandomState(4)
    B, N, C, K = 1, 100, 128, 4
    x = rng.randn(B, N, C).astype(np.float32)
    c = rng.randn(K, C).astype(np.float32)
    W = (rng.randn(C, K) * 0.1).astype(np.float32)
    b = np.zeros(K, np.float32)
    mask = np.zeros((B, N), np.float32)
    mask[:, :70] = 1
    got = np.asarray(
        netvlad_fused(
            jnp.asarray(x), jnp.asarray(c), jnp.asarray(W), jnp.asarray(b),
            mask=jnp.asarray(mask), chunk=32, interpret=True,
        )
    )
    want = np.asarray(
        netvlad_aggregate(
            jnp.asarray(x), jnp.asarray(c), jnp.asarray(W), jnp.asarray(b),
            mask=jnp.asarray(mask),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_netvlad_fused_rect_matches_masked_oracle():
    from irtpu.ops.pallas import netvlad_fused_rect

    rng = np.random.RandomState(13)
    B, H, W, C, K = 3, 8, 12, 128, 8
    x = rng.randn(B, H, W, C).astype(np.float32)
    c = rng.randn(K, C).astype(np.float32)
    aw = (rng.randn(C, K) * 0.1).astype(np.float32)
    b = rng.randn(K).astype(np.float32)
    sizes = np.array([[8, 12], [5, 7], [2, 12]], np.int32)
    got = np.asarray(
        netvlad_fused_rect(
            jnp.asarray(x), jnp.asarray(c), jnp.asarray(aw), jnp.asarray(b),
            sizes=jnp.asarray(sizes), chunk=32, interpret=True,
        )
    )
    mask = np.zeros((B, H, W), np.float32)
    for r, (h, w) in enumerate(sizes):
        mask[r, :h, :w] = 1
    want = np.asarray(
        netvlad_aggregate(
            jnp.asarray(x.reshape(B, H * W, C)), jnp.asarray(c),
            jnp.asarray(aw), jnp.asarray(b),
            mask=jnp.asarray(mask.reshape(B, H * W)),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_netvlad_fused_grad_matches_oracle():
    """custom VJP: grads of the fused NetVLAD == grads of the jnp oracle
    for every differentiable input (features, centroids, assignment FC)."""
    import jax

    rng = np.random.RandomState(14)
    B, N, C, K = 2, 48, 128, 4
    x = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    c = jnp.asarray(rng.randn(K, C).astype(np.float32))
    aw = jnp.asarray((rng.randn(C, K) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.randn(K).astype(np.float32))
    wv = jnp.asarray(rng.randn(B, K * C).astype(np.float32))

    def loss_fused(x, c, aw, b):
        return jnp.sum(netvlad_fused(x, c, aw, b, interpret=True) * wv)

    def loss_oracle(x, c, aw, b):
        return jnp.sum(netvlad_aggregate(x, c, aw, b) * wv)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, c, aw, b)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2, 3))(x, c, aw, b)
    for a, o in zip(gf, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(o), rtol=1e-4, atol=1e-5)


def test_netvlad_fused_rect_grad_matches_masked_oracle():
    import jax
    from irtpu.ops.pallas import netvlad_fused_rect

    rng = np.random.RandomState(15)
    B, H, W, C, K = 2, 6, 8, 128, 4
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    c = jnp.asarray(rng.randn(K, C).astype(np.float32))
    aw = jnp.asarray((rng.randn(C, K) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.randn(K).astype(np.float32))
    sizes = jnp.asarray([[6, 8], [3, 5]], jnp.int32)
    wv = jnp.asarray(rng.randn(B, K * C).astype(np.float32))
    mask = np.zeros((B, H * W), np.float32)
    for r, (h, w) in enumerate(np.asarray(sizes)):
        mask.reshape(B, H, W)[r, :h, :w] = 1

    def loss_fused(x, c, aw, b):
        return jnp.sum(
            netvlad_fused_rect(x, c, aw, b, sizes=sizes, interpret=True) * wv
        )

    def loss_oracle(x, c, aw, b):
        return jnp.sum(
            netvlad_aggregate(
                x.reshape(B, H * W, C), c, aw, b, mask=jnp.asarray(mask)
            ) * wv
        )

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, c, aw, b)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2, 3))(x, c, aw, b)
    for a, o in zip(gf, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(o), rtol=1e-4, atol=1e-5)


def test_model_pallas_netvlad_masked_head_matches_oracle():
    """RetrievalNet(netvlad, use_pallas) on a bucketed (rect-masked) batch."""
    import jax
    from irtpu.models import RetrievalNet

    m_pallas = RetrievalNet(
        arch="resnet18", pooling="netvlad", netvlad_clusters=4, use_pallas=True
    )
    m_oracle = RetrievalNet(
        arch="resnet18", pooling="netvlad", netvlad_clusters=4, use_pallas=False
    )
    rng = np.random.RandomState(16)
    x = rng.rand(2, 64, 96, 3).astype(np.float32)
    mask = np.zeros((2, 64, 96), bool)
    mask[0, :64, :96] = True
    mask[1, :40, :64] = True
    v = m_oracle.init(jax.random.PRNGKey(0), jnp.asarray(x))
    d1 = np.asarray(m_pallas.apply(v, jnp.asarray(x), mask=jnp.asarray(mask)))
    d2 = np.asarray(m_oracle.apply(v, jnp.asarray(x), mask=jnp.asarray(mask)))
    np.testing.assert_allclose(d1, d2, rtol=1e-4, atol=1e-5)


def test_model_pallas_netvlad_nonrect_mask_falls_back_to_oracle():
    """An arbitrary (non-rectangular) mask through the public use_pallas
    NetVLAD path must produce the exact oracle descriptors, not silently
    wrong rect-kernel output (ADVICE r2)."""
    import jax
    from irtpu.models import RetrievalNet

    m_pallas = RetrievalNet(
        arch="resnet18", pooling="netvlad", netvlad_clusters=4, use_pallas=True
    )
    m_oracle = RetrievalNet(
        arch="resnet18", pooling="netvlad", netvlad_clusters=4, use_pallas=False
    )
    rng = np.random.RandomState(17)
    x = rng.rand(2, 64, 96, 3).astype(np.float32)
    # checkerboard-ish holes: definitely not a top-left rectangle
    mask = rng.rand(2, 64, 96) > 0.35
    mask[:, 0, 0] = True
    v = m_oracle.init(jax.random.PRNGKey(0), jnp.asarray(x))
    d1 = np.asarray(m_pallas.apply(v, jnp.asarray(x), mask=jnp.asarray(mask)))
    d2 = np.asarray(m_oracle.apply(v, jnp.asarray(x), mask=jnp.asarray(mask)))
    np.testing.assert_allclose(d1, d2, rtol=1e-4, atol=1e-5)


def test_bottleneck_fused_matches_oracle():
    """VMEM-resident fused bottleneck vs the XLA composition, including
    border tiles (zero-pad halo) and multi-tile interiors."""
    from irtpu.ops.pallas.bottleneck_block import bottleneck_fused, bottleneck_oracle

    rng = np.random.RandomState(20)
    for B, H, W, Cin, Cm in [(1, 16, 16, 128, 32), (2, 32, 16, 128, 32),
                             (1, 24, 40, 128, 32)]:
        x = (rng.randn(B, H, W, Cin) * 0.5).astype(np.float32)
        w1 = (rng.randn(Cin, Cm) * 0.05).astype(np.float32)
        w2 = (rng.randn(3, 3, Cm, Cm) * 0.05).astype(np.float32)
        w3 = (rng.randn(Cm, Cin) * 0.05).astype(np.float32)
        b1 = (rng.randn(Cm) * 0.1).astype(np.float32)
        b2 = (rng.randn(Cm) * 0.1).astype(np.float32)
        b3 = (rng.randn(Cin) * 0.1).astype(np.float32)
        args = [jnp.asarray(v) for v in (x, w1, b1, w2, b2, w3, b3)]
        got = np.asarray(bottleneck_fused(*args, interpret=True))
        want = np.asarray(bottleneck_oracle(*args))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5,
                                   err_msg=f"{(B, H, W)}")


def test_fused_trunk_matches_flax_trunk():
    """BN-folded fused trunk == the flax trunk (inference), resnet50."""
    import jax
    from irtpu.models.resnet import ResNetTrunk
    from irtpu.models.fused_trunk import fold_trunk_variables, trunk_apply_fused

    trunk = ResNetTrunk("resnet50")
    rng = np.random.RandomState(21)
    x = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    v = trunk.init(jax.random.PRNGKey(0), x)
    # randomized BN stats so the fold is actually exercised
    v = jax.tree.map(
        lambda a: a + jnp.asarray(
            np.abs(rng.randn(*a.shape)).astype(np.float32) * 0.1
        ) if a.ndim == 1 else a,
        v,
    )
    want = np.asarray(trunk.apply(v, x))
    folded = fold_trunk_variables(v, "resnet50")
    got = np.asarray(trunk_apply_fused(folded, x, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_retrieval_net_precomputed_features_path():
    """RetrievalNet(head-only) on precomputed features == full forward."""
    import jax
    from irtpu.models import RetrievalNet
    from irtpu.models.fused_trunk import fold_trunk_variables, trunk_apply_fused

    m = RetrievalNet(arch="resnet50", pooling="gem")
    rng = np.random.RandomState(22)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    want = np.asarray(m.apply(v, x))
    folded = fold_trunk_variables(v, "resnet50")
    feats = trunk_apply_fused(folded, x, interpret=True)
    got = np.asarray(m.apply(v, feats, precomputed_features=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_scores_blockmax_matches_matmul():
    from irtpu.ops.pallas.score_topk import scores_blockmax

    rng = np.random.RandomState(5)
    g = rng.randn(300, 256).astype(np.float32)  # pads to 1024
    q = rng.randn(10, 256).astype(np.float32)
    s, bmax = scores_blockmax(jnp.asarray(g), jnp.asarray(q), interpret=True)
    want = q @ g.T
    np.testing.assert_allclose(np.asarray(s)[:, :300], want, rtol=1e-5, atol=1e-5)
    # padded cols masked
    assert (np.asarray(s)[:, 300:] < -1e30).all()
    # block maxima correct (default block width 64)
    s_np = np.asarray(s)
    np.testing.assert_allclose(
        np.asarray(bmax), s_np.reshape(10, -1, 64).max(-1), rtol=1e-6
    )


def test_pallas_topk_search_exact():
    from irtpu.ops.pallas.score_topk import pallas_topk_search

    rng = np.random.RandomState(6)
    g = rng.randn(2000, 64).astype(np.float32)
    q = rng.randn(9, 64).astype(np.float32)
    s, i = pallas_topk_search(jnp.asarray(g), jnp.asarray(q), k=37, interpret=True)
    want = np.argsort(-(q @ g.T), axis=1, kind="stable")[:, :37]
    np.testing.assert_array_equal(np.asarray(i), want)


def test_pallas_topk_search_ties():
    from irtpu.ops.pallas.score_topk import pallas_topk_search

    rng = np.random.RandomState(7)
    g = np.repeat(rng.randn(20, 32).astype(np.float32), 60, axis=0)  # heavy dups
    q = rng.randn(3, 32).astype(np.float32)
    s, i = pallas_topk_search(jnp.asarray(g), jnp.asarray(q), k=50, interpret=True)
    want = np.argsort(-(q @ g.T), axis=1, kind="stable")[:, :50]
    np.testing.assert_array_equal(np.asarray(i), want)


def test_pallas_topk_search_all_negative_scores_with_pad():
    """Regression: the block straddling the Ng boundary used to keep pad
    scores of 0.0 in its block maximum; with all-negative genuine scores the
    inflated max evicted the true best blocks from stage-2 selection."""
    from irtpu.ops.pallas.score_topk import pallas_topk_search

    rng = np.random.RandomState(8)
    # all-positive queries x all-negative gallery -> every score negative;
    # Ng=1000 pads to 1024 (ch=512), so block 15 straddles the boundary
    g = -np.abs(rng.randn(1000, 64)).astype(np.float32) - 0.1
    q = np.abs(rng.randn(5, 64)).astype(np.float32) + 0.1
    s, i = pallas_topk_search(jnp.asarray(g), jnp.asarray(q), k=8, interpret=True)
    want = np.argsort(-(q @ g.T), axis=1, kind="stable")[:, :8]
    np.testing.assert_array_equal(np.asarray(i), want)
    assert (np.asarray(s) < 0).all()


def test_gem_l2n_fused_rect_matches_masked_oracle():
    from irtpu.ops.pallas import gem_l2n_fused_rect

    rng = np.random.RandomState(9)
    x = rng.rand(3, 8, 12, 128).astype(np.float32)
    sizes = np.array([[8, 12], [5, 7], [2, 12]], np.int32)
    got = np.asarray(
        gem_l2n_fused_rect(jnp.asarray(x), 3.0, jnp.asarray(sizes), chunk=32,
                           interpret=True)
    )
    mask = np.zeros((3, 8, 12), bool)
    for r, (h, w) in enumerate(sizes):
        mask[r, :h, :w] = True
    want = np.asarray(l2n(gem(jnp.asarray(x), 3.0, mask=jnp.asarray(mask))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_model_pallas_masked_head_matches_oracle():
    """RetrievalNet with use_pallas on a bucketed (rect-masked) batch."""
    import jax
    from irtpu.models import RetrievalNet

    m_pallas = RetrievalNet(arch="resnet18", pooling="gem", use_pallas=True)
    m_oracle = RetrievalNet(arch="resnet18", pooling="gem", use_pallas=False)
    rng = np.random.RandomState(10)
    x = rng.rand(2, 64, 96, 3).astype(np.float32)
    mask = np.zeros((2, 64, 96), bool)
    mask[0, :64, :96] = True
    mask[1, :40, :64] = True
    v = m_oracle.init(jax.random.PRNGKey(0), jnp.asarray(x))
    d1 = np.asarray(m_pallas.apply(v, jnp.asarray(x), mask=jnp.asarray(mask)))
    d2 = np.asarray(m_oracle.apply(v, jnp.asarray(x), mask=jnp.asarray(mask)))
    np.testing.assert_allclose(d1, d2, rtol=1e-4, atol=1e-5)
