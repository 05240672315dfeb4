"""NetVLAD k-means initialization (SURVEY.md §7: centroid init hard part)."""

import numpy as np
import jax
import jax.numpy as jnp

from irtpu.models import create_model
from irtpu.training.netvlad_init import (
    kmeans,
    init_netvlad_params,
    init_netvlad_from_images,
)
from irtpu.utils.config import ExtractConfig, ModelConfig


def test_kmeans_recovers_clusters():
    rng = np.random.RandomState(0)
    centers = rng.randn(4, 8).astype(np.float32) * 5
    x = np.concatenate([centers[i] + rng.randn(50, 8).astype(np.float32) * 0.1
                        for i in range(4)])
    cent, assign = kmeans(jnp.asarray(x), 4, iters=20)
    cent = np.asarray(cent)
    assign = np.asarray(assign)
    # every true center has a learned centroid within noise distance
    d = np.linalg.norm(centers[:, None] - cent[None], axis=-1)
    assert (d.min(axis=1) < 0.5).all(), d.min(axis=1)
    # points of one true cluster share an assignment
    for i in range(4):
        assert len(set(assign[i * 50 : (i + 1) * 50])) == 1


def test_init_gives_near_hard_assignment():
    rng = np.random.RandomState(1)
    cent = rng.randn(8, 16).astype(np.float32)
    head = init_netvlad_params(cent, alpha=100.0)
    # a feature AT a centroid must soft-assign to it with weight ~1
    logits = cent @ head["assign_w"] + head["assign_b"]
    a = np.exp(logits - logits.max(axis=1, keepdims=True))
    a /= a.sum(axis=1, keepdims=True)
    np.testing.assert_allclose(np.diag(a), 1.0, atol=1e-3)


def test_init_netvlad_from_images_end_to_end():
    cfg = ExtractConfig(
        model=ModelConfig(arch="resnet18", pooling="netvlad", netvlad_clusters=4),
        image_size=64, batch_size=2,
    )
    model = create_model(arch="resnet18", pooling="netvlad", netvlad_clusters=4)
    rng = np.random.RandomState(2)
    imgs = [rng.rand(64, 64, 3).astype(np.float32) for _ in range(4)]
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(imgs[0])[None])
    v2 = init_netvlad_from_images(model, variables, imgs, cfg, seed=3)
    # head re-initialized, trunk untouched
    assert not np.array_equal(
        np.asarray(v2["params"]["centroids"]),
        np.asarray(variables["params"]["centroids"]),
    )
    t1 = jax.tree.leaves(variables["params"]["trunk"])[0]
    t2 = jax.tree.leaves(v2["params"]["trunk"])[0]
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    # model runs with the new head
    d = model.apply(v2, jnp.asarray(imgs[0])[None])
    assert d.shape == (1, 512 * 4)
    assert np.isfinite(np.asarray(d)).all()
