"""Global descriptor pooling: MAC, SPoC, GeM, R-MAC.

Numerics follow the cirtorch-lineage functionals the reference derives from
(`layers/pooling.py` / `layers/functional.py` in SURVEY.md §2; the reference
mount was empty, so semantics are reconstructed from that lineage):

  * ``gem``:  ``(mean(clamp(x, eps)^p))^(1/p)`` over spatial dims, p init 3.0,
    eps = 1e-6.
  * ``mac``:  spatial max.
  * ``spoc``: spatial mean.
  * ``rmac``: multi-scale regional MAC; each regional vector L2-normalized
    then summed (final L2N is applied by the model head, not here).

TPU-native difference from the reference: every pool takes an optional
boolean ``mask [B, H, W]`` marking *valid* feature positions. The reference
runs batch-size-1 with variable image shapes; on TPU we batch images into
static-shape buckets and pad, and an unmasked pad would silently corrupt
GeM/SPoC means (SURVEY.md §7 "hard parts"). With ``mask=None`` the results
are bitwise-identical in structure to the reference math.

Layout: NHWC ``[B, H, W, C]`` (TPU-native), vs. the reference's NCHW.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Optional

import jax.numpy as jnp

GEM_EPS = 1e-6


def _masked(x: jnp.ndarray, mask: Optional[jnp.ndarray], fill: float):
    """Replace invalid positions with ``fill``. mask: [B,H,W] -> broadcast C."""
    if mask is None:
        return x, None
    m = mask[..., None].astype(x.dtype)  # [B,H,W,1]
    return x * m + (1.0 - m) * fill, m


def mac(x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Maximum activations of convolutions: spatial max. [B,H,W,C] -> [B,C]."""
    if mask is not None:
        neg = jnp.finfo(x.dtype).min
        x = jnp.where(mask[..., None], x, neg)
    return jnp.max(x, axis=(1, 2))


def spoc(x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Sum-pooling of convolutions: spatial mean. [B,H,W,C] -> [B,C]."""
    if mask is None:
        return jnp.mean(x, axis=(1, 2))
    m = mask[..., None].astype(x.dtype)
    denom = jnp.maximum(jnp.sum(m, axis=(1, 2)), 1.0)
    return jnp.sum(x * m, axis=(1, 2)) / denom


def gem(
    x: jnp.ndarray,
    p: jnp.ndarray | float = 3.0,
    eps: float = GEM_EPS,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Generalized-mean pooling. [B,H,W,C] -> [B,C].

    ``(mean_{hw}(clamp(x, eps)^p))^(1/p)`` — learnable scalar ``p``.
    """
    p = jnp.asarray(p, dtype=x.dtype)
    xc = jnp.clip(x, min=eps)
    xp = jnp.power(xc, p)
    if mask is None:
        pooled = jnp.mean(xp, axis=(1, 2))
    else:
        m = mask[..., None].astype(x.dtype)
        denom = jnp.maximum(jnp.sum(m, axis=(1, 2)), 1.0)
        pooled = jnp.sum(xp * m, axis=(1, 2)) / denom
    return jnp.power(pooled, 1.0 / p)


def rmac_regions(H: int, W: int, L: int = 3) -> list[tuple[int, int, int, int]]:
    """Static R-MAC region grid (y, x, h, w) for a HxW feature map.

    Follows the Tolias et al. / cirtorch region sampling: square regions of
    side ``2*min(H,W)/(l+1)`` at scale l, uniformly placed with ~40% overlap.
    Computed at trace time from static shapes — no dynamic control flow.
    """
    ovr = 0.4
    steps = jnp.array([2, 3, 4, 5, 6, 7])
    w_min = min(W, H)
    # which spacing best approximates the target overlap along the long side
    b = (max(H, W) - w_min) / (steps - 1)
    idx = int(jnp.argmin(jnp.abs(((w_min ** 2 - w_min * b) / w_min ** 2) - ovr)))
    # number of extra regions along the long side
    Wd = idx + 1 if W > H else 0
    Hd = idx + 1 if H > W else 0

    regions: list[tuple[int, int, int, int]] = []
    for l in range(1, L + 1):
        wl = int(math.floor(2 * w_min / (l + 1)))
        if wl == 0:
            continue
        # centers
        if l + Wd - 1 > 0:
            bx = (W - wl) / (l + Wd - 1)
        else:
            bx = 0.0
        cenW = [int(math.floor(bx * i)) for i in range(l - 1 + Wd + 1)]
        if l + Hd - 1 > 0:
            by = (H - wl) / (l + Hd - 1)
        else:
            by = 0.0
        cenH = [int(math.floor(by * j)) for j in range(l - 1 + Hd + 1)]
        for yy in cenH:
            for xx in cenW:
                regions.append((yy, xx, wl, wl))
    return regions


def rmac(
    x: jnp.ndarray,
    L: int = 3,
    eps: float = 1e-6,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Regional MAC. [B,H,W,C] -> [B,C].

    Full-image MAC (L2-normalized) plus L2-normalized regional MACs, summed.
    Regions are a static function of the (static) feature-map shape, so this
    is fully jit-able.

    With ``mask``, invalid positions are excluded from every regional max
    and regions with no valid overlap contribute nothing — this prevents
    padded positions from silently corrupting descriptors. NOTE: the region
    GRID still comes from the padded shape, so masked R-MAC is not
    reference-exact; for parity use exact shapes (``ExtractConfig(exact=
    True)``, enforced by the Extractor), where the mask is trivially full.
    """
    from image_retrieval_for_image_based_localization_tpu.ops.normalization import l2n

    B, H, W, C = x.shape
    neg = jnp.finfo(x.dtype).min
    if mask is not None:
        x = jnp.where(mask[..., None], x, neg)

    def region_vec(r, rm):
        v = l2n(jnp.max(r, axis=(1, 2)), eps=eps)
        if rm is None:
            return v
        any_valid = jnp.any(rm, axis=(1, 2))[:, None].astype(v.dtype)
        return v * any_valid

    v = region_vec(x, mask)
    for (yy, xx, hh, ww) in rmac_regions(H, W, L):
        r = x[:, yy : yy + hh, xx : xx + ww, :]
        rm = None if mask is None else mask[:, yy : yy + hh, xx : xx + ww]
        v = v + region_vec(r, rm)
    return v


POOLING_FNS: Dict[str, Callable] = {
    "mac": mac,
    "spoc": spoc,
    "gem": gem,
    "rmac": rmac,
}
