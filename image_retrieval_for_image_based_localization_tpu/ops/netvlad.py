"""NetVLAD soft-assignment aggregation (functional core).

Follows the NetVLAD head the reference vendors (`layers/netvlad.py` in
SURVEY.md §2; Arandjelović et al., CVPR 2016): a 1x1 conv scores each local
feature against K clusters, softmax soft-assigns, residuals against the
cluster centroids are accumulated, intra-(per-cluster)-L2-normalized,
flattened, and globally L2-normalized.

TPU-native formulation: the spatial map is flattened to ``[B, N, C]`` and the
whole aggregation is two matmuls plus a softmax — MXU-shaped by construction.
``ops.pallas.netvlad_kernel`` provides the fused single-pass kernel; this
jnp version is the oracle. Supports a validity mask for padded buckets
(assignment of padded positions is zeroed before accumulation).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from image_retrieval_for_image_based_localization_tpu.ops.normalization import l2n


def netvlad_aggregate(
    x: jnp.ndarray,
    centroids: jnp.ndarray,
    assign_w: jnp.ndarray,
    assign_b: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Aggregate local features into a VLAD descriptor.

    Args:
      x: ``[B, N, C]`` local features (flattened H*W) or ``[B, H, W, C]``.
      centroids: ``[K, C]`` cluster centers.
      assign_w: ``[C, K]`` 1x1-conv assignment weights.
      assign_b: ``[K]`` optional assignment bias.
      mask: ``[B, N]`` (or ``[B, H, W]``) validity mask for padded positions.

    Returns:
      ``[B, K*C]`` descriptor: intra-normalized per cluster, then global L2N.
    """
    if x.ndim == 4:
        B, H, W, C = x.shape
        x = x.reshape(B, H * W, C)
        if mask is not None:
            mask = mask.reshape(B, H * W)
    B, N, C = x.shape
    K = centroids.shape[0]

    logits = jnp.einsum("bnc,ck->bnk", x, assign_w)
    if assign_b is not None:
        logits = logits + assign_b[None, None, :]
    assign = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    assign = assign / jnp.sum(assign, axis=-1, keepdims=True)
    if mask is not None:
        assign = assign * mask[..., None].astype(assign.dtype)

    # vlad[b,k,c] = sum_n a[b,n,k] * (x[b,n,c] - centroids[k,c])
    #            = (a^T x)[b,k,c] - (sum_n a[b,n,k]) * centroids[k,c]
    agg = jnp.einsum("bnk,bnc->bkc", assign, x)
    counts = jnp.sum(assign, axis=1)  # [B, K]
    vlad = agg - counts[..., None] * centroids[None, :, :]

    vlad = l2n(vlad, axis=-1)          # intra-normalization per cluster
    vlad = vlad.reshape(B, K * C)
    return l2n(vlad, axis=-1)          # global L2 normalization
