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


def test_netvlad_kmeans_synthetic_map_pin(tmp_path):
    """Config-3 accuracy anchor (VERDICT r3 item 5): the NetVLAD path with
    k-means centroid init must hit a pinned mAP on the synthetic corpus —
    a regression floor for the soft-assignment head + init machinery while
    real RParis data is unavailable (zero egress)."""
    from irtpu.data.test_datasets import make_synthetic_dataset
    from irtpu.evaluation.harness import evaluate_dataset
    from irtpu.api import Extractor
    from irtpu.utils.config import IndexConfig

    ds = make_synthetic_dataset(
        str(tmp_path), n_scenes=5, views_per_scene=4, n_distractors=6,
        image_hw=(96, 128), seed=7,
    )
    cfg = ExtractConfig(
        model=ModelConfig(arch="resnet18", pooling="netvlad",
                          netvlad_clusters=8),
        image_size=96, batch_size=4,
    )
    model = create_model(arch="resnet18", pooling="netvlad", netvlad_clusters=8)
    rng = np.random.RandomState(0)
    probe = rng.rand(96, 96, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(probe)[None])
    # k-means init from the database images (the reference's off-the-shelf
    # NetVLAD centroid protocol, SURVEY.md §7 "NetVLAD centroids")
    variables = init_netvlad_from_images(
        model, variables, ds.image_paths[:12], cfg, seed=1
    )
    res = evaluate_dataset(
        ds, cfg, IndexConfig(whitening="pca", whiten_dims=256),
        variables=variables,
    )["results"]
    # pinned from the round-3 run that introduced this test (medium mAP was
    # 0.72 on CPU); regressions in the kernel/init/whitening chain surface
    # as a drop well below the floor
    assert res["medium"]["map"] >= 0.55, res["medium"]["map"]
