"""NetVLAD centroid initialization: k-means over trunk local features.

The reference initializes NetVLAD centroids from k-means on backbone
descriptors (SURVEY.md §2 "centroids init from k-means"; §7 hard parts:
without it config 3's accuracy is blocked). TPU-native: Lloyd iterations
run jitted on device (assignment = one MXU matmul per iteration), features
are sampled from the trunk over a corpus, and the soft-assignment conv is
set per the NetVLAD paper: ``w_k = 2*alpha*c_k``, ``b_k = -alpha*||c_k||^2``
so softmax assignment approaches the hard k-means assignment as alpha grows.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def kmeans(
    x: jnp.ndarray, k: int, iters: int = 25, key: Optional[jax.Array] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lloyd k-means on device. x: [N, D] -> (centroids [k, D], assign [N]).

    Init: k points sampled without replacement. Empty clusters keep their
    previous centroid (standard fix). Assignment argmin ties -> lowest id.
    """
    N, D = x.shape
    if key is None:
        key = jax.random.PRNGKey(0)
    init_idx = jax.random.choice(key, N, shape=(k,), replace=False)
    cent0 = x[init_idx]

    x_sq = jnp.sum(x * x, axis=1, keepdims=True)  # [N, 1]

    def step(cent, _):
        # dists^2 = |x|^2 - 2 x.c + |c|^2 ; argmin over k (MXU matmul)
        xc = jax.lax.dot_general(
            x, cent, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        d2 = x_sq - 2.0 * xc + jnp.sum(cent * cent, axis=1)[None, :]
        assign = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=x.dtype)  # [N, k]
        counts = jnp.sum(onehot, axis=0)  # [k]
        sums = jax.lax.dot_general(
            onehot, x, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [k, D]
        new_cent = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), cent
        )
        return new_cent, None

    cent, _ = jax.lax.scan(step, cent0, None, length=iters)
    xc = jax.lax.dot_general(
        x, cent, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    d2 = x_sq - 2.0 * xc + jnp.sum(cent * cent, axis=1)[None, :]
    return cent, jnp.argmin(d2, axis=1)


def collect_local_features(
    model,
    variables: Dict,
    images: Sequence,
    cfg,
    max_features: int = 50_000,
    per_image: int = 256,
    seed: int = 0,
) -> np.ndarray:
    """Sample trunk local features [M, C] over a corpus (for k-means)."""
    from image_retrieval_for_image_based_localization_tpu.data.images import (
        make_batches,
    )

    from image_retrieval_for_image_based_localization_tpu.models.retrieval_net import (
        build_trunk,
    )

    # build_trunk directly: calling methods on an unbound flax Module would
    # try to register the child in a (nonexistent) parent scope
    trunk = build_trunk(model.arch, model.dtype)
    trunk_vars = {"params": variables["params"]["trunk"]}
    if variables.get("batch_stats"):
        trunk_vars["batch_stats"] = variables["batch_stats"]["trunk"]
    fwd = jax.jit(lambda v, x: trunk.apply(v, x))

    rng = np.random.RandomState(seed)
    feats = []
    total = 0
    for batch in make_batches(
        images, image_size=cfg.image_size, batch_size=cfg.batch_size,
        bucket_multiple=cfg.bucket_multiple,
    ):
        f = np.asarray(fwd(trunk_vars, jnp.asarray(batch.pixels)))
        B, h, w, C = f.shape
        stride_h = batch.pixels.shape[1] // h
        stride_w = batch.pixels.shape[2] // w
        fmask = batch.mask[:, ::stride_h, ::stride_w][:, :h, :w]
        for row in range(len(batch.indices)):
            valid = f[row][fmask[row]]
            if valid.shape[0] == 0:
                continue
            take = min(per_image, valid.shape[0])
            sel = rng.choice(valid.shape[0], take, replace=False)
            feats.append(valid[sel])
            total += take
        if total >= max_features:
            break
    out = np.concatenate(feats, axis=0)[:max_features]
    return out.astype(np.float32)


def init_netvlad_params(
    centroids: np.ndarray, alpha: float = 100.0
) -> Dict[str, np.ndarray]:
    """NetVLAD-paper soft-assignment init from k-means centroids."""
    c = np.asarray(centroids, np.float32)
    return {
        "centroids": c,
        "assign_w": (2.0 * alpha * c).T.astype(np.float32),  # [C, K]
        "assign_b": (-alpha * np.sum(c * c, axis=1)).astype(np.float32),
    }


def init_netvlad_from_images(
    model,
    variables: Dict,
    images: Sequence,
    cfg,
    alpha: float = 100.0,
    kmeans_iters: int = 25,
    seed: int = 0,
) -> Dict:
    """Return ``variables`` with NetVLAD head re-initialized from k-means on
    the trunk's local features over ``images`` (reference init semantics)."""
    if model.pooling != "netvlad":
        raise ValueError("model.pooling must be 'netvlad'")
    feats = collect_local_features(model, variables, images, cfg, seed=seed)
    cent, _ = kmeans(
        jnp.asarray(feats), model.netvlad_clusters, iters=kmeans_iters,
        key=jax.random.PRNGKey(seed),
    )
    head = init_netvlad_params(np.asarray(cent), alpha=alpha)
    params = dict(variables["params"])
    params.update({k: jnp.asarray(v) for k, v in head.items()})
    out = dict(variables)
    out["params"] = params
    return out
