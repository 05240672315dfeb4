"""The descriptor model: trunk ∘ pool ∘ (whiten FC) ∘ L2N.

Mirrors the reference's `ImageRetrievalNet` composition
(`networks/imageretrievalnet.py`, SURVEY.md §3.3; reference mount empty —
structure from the cirtorch lineage): backbone features → global pooling
(GeM/MAC/SPoC/R-MAC or NetVLAD) → optional learned whitening FC → L2N.

TPU-native differences:
  * batched NHWC with an optional validity mask for padded static-shape
    buckets (the reference runs bs=1 variable shapes);
  * descriptors returned ``[B, D]`` (reference returns D x B);
  * ``use_pallas=True`` swaps the pooling+L2N tail for the fused Pallas
    kernel (``ops.pallas``) — numerically equivalent, equivalence-tested.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from image_retrieval_for_image_based_localization_tpu.models.resnet import (
    ResNetTrunk,
)
from image_retrieval_for_image_based_localization_tpu.models.vgg import VGGTrunk
from image_retrieval_for_image_based_localization_tpu.ops import (
    gem,
    mac,
    spoc,
    rmac,
    rpool,
    l2n,
    netvlad_aggregate,
)

# trunk output channels per arch
OUTPUT_DIM = {
    "resnet18": 512,
    "resnet34": 512,
    "resnet50": 2048,
    "resnet101": 2048,
    "resnet152": 2048,
    "vgg16": 512,
    "alexnet": 256,
    "squeezenet1_1": 512,
    "densenet121": 1024,
    "densenet169": 1664,
    "densenet201": 1920,
    "densenet161": 2208,
}


def build_trunk(arch: str, dtype: Any = jnp.float32, name: Optional[str] = None,
                s2d_stem: bool = False):
    kw = {} if name is None else {"name": name}
    if arch.startswith("resnet"):
        return ResNetTrunk(arch, dtype, s2d_stem=s2d_stem, **kw)
    if arch.startswith("vgg"):
        return VGGTrunk(arch, dtype, **kw)
    if arch.startswith("alexnet"):
        from image_retrieval_for_image_based_localization_tpu.models.alexnet import (
            AlexNetTrunk,
        )

        return AlexNetTrunk(arch, dtype, **kw)
    if arch.startswith("densenet"):
        from image_retrieval_for_image_based_localization_tpu.models.densenet import (
            DenseNetTrunk,
        )

        return DenseNetTrunk(arch, dtype, **kw)
    if arch.startswith("squeezenet"):
        from image_retrieval_for_image_based_localization_tpu.models.squeezenet import (
            SqueezeNetTrunk,
        )

        return SqueezeNetTrunk(arch, dtype, **kw)
    raise ValueError(f"unknown arch {arch!r}")


class RetrievalNet(nn.Module):
    """Backbone + descriptor head.

    Attributes:
      arch: trunk architecture name (see OUTPUT_DIM).
      pooling: 'gem' | 'gemmp' (per-channel p) | 'mac' | 'spoc' | 'rmac' | 'netvlad'.
      whiten_dim: if set, adds a learned FC whitening layer C -> whiten_dim.
      netvlad_clusters: K for NetVLAD.
      gem_p_trainable: learn GeM's p (reference default: learnable, init 3.0).
    """

    arch: str = "resnet50"
    pooling: str = "gem"
    regional: bool = False
    whiten_dim: Optional[int] = None
    netvlad_clusters: int = 64
    gem_p: float = 3.0
    gem_p_trainable: bool = True
    dtype: Any = jnp.float32
    use_pallas: bool = False
    # space-to-depth stem rewrite (resnets only; exact — same parameters,
    # better MXU contraction geometry; see models.resnet._S2DConv7x7s2)
    s2d_stem: bool = False

    @property
    def out_dim(self) -> int:
        c = OUTPUT_DIM[self.arch]
        if self.pooling == "netvlad":
            c = c * self.netvlad_clusters
        if self.whiten_dim is not None:
            c = self.whiten_dim
        return c

    def make_trunk(self, name: Optional[str] = "trunk"):
        """Trunk module; ``name=None`` gives a standalone-applicable module
        (an explicitly named flax module requires a parent scope)."""
        return build_trunk(self.arch, self.dtype, name=name,
                           s2d_stem=self.s2d_stem)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        train: bool = False,
        precomputed_features: bool = False,
        return_features: bool = False,
        return_regions: bool = False,
    ) -> jnp.ndarray:
        if precomputed_features:
            # x is already the trunk feature map (e.g. from the inference-
            # fused trunk, models.fused_trunk); mask must be given at
            # feature resolution. Init never takes this path, so the trunk
            # params are declared normally.
            feats, fmask = x, mask
        else:
            feats = self.make_trunk()(x, train=train)  # [B, h, w, C]
            fmask = None
            if mask is not None:
                # Downsample the pixel-validity mask to the feature stride.
                stride_h = x.shape[1] // feats.shape[1]
                stride_w = x.shape[2] // feats.shape[2]
                fmask = mask[:, ::stride_h, ::stride_w][
                    :, : feats.shape[1], : feats.shape[2]
                ]

        if return_features:
            # cirtorch extract_local_vectors: every spatial position's
            # trunk activation, L2-normalized over channels — [B, h, w, C].
            # Padded positions (bucketed batches) are zeroed so they can't
            # masquerade as real unit-norm features downstream.
            f = l2n(feats.astype(jnp.float32))
            if fmask is not None:
                f = f * fmask[..., None].astype(f.dtype)
            return f

        if return_regions and not self.regional:
            raise ValueError("return_regions requires regional=True")
        if self.regional and self.pooling not in ("gem", "mac", "spoc"):
            # validate BEFORE the pooling dispatch: regional + netvlad
            # would otherwise take the netvlad branch and silently ignore
            # the flag
            raise ValueError(
                f"regional pooling wraps gem/mac/spoc, not {self.pooling!r}")

        if self.pooling == "netvlad":
            C = feats.shape[-1]
            K = self.netvlad_clusters
            centroids = self.param(
                "centroids", nn.initializers.normal(1.0), (K, C), jnp.float32
            )
            assign_w = self.param(
                "assign_w", nn.initializers.lecun_normal(), (C, K), jnp.float32
            )
            assign_b = self.param("assign_b", nn.initializers.zeros, (K,), jnp.float32)
            fm = None if fmask is None else fmask.reshape(feats.shape[0], -1)
            if self.use_pallas:
                from image_retrieval_for_image_based_localization_tpu.ops.pallas import (
                    netvlad_fused,
                    netvlad_fused_rect,
                )

                if fmask is None:
                    desc = netvlad_fused(
                        feats.reshape(feats.shape[0], -1, C).astype(jnp.float32),
                        centroids,
                        assign_w,
                        assign_b,
                    )
                else:
                    # bucketing guarantees top-left-rectangle validity; the
                    # masked fused kernel takes (h, w) extents in SMEM. A
                    # caller-supplied mask might not be rectangular, so
                    # verify (sum(mask) == h*w per row) and fall back to the
                    # exact any-mask oracle inside netvlad_fused otherwise.
                    sizes = jnp.stack(
                        [
                            jnp.sum(jnp.any(fmask, axis=2), axis=1),
                            jnp.sum(jnp.any(fmask, axis=1), axis=1),
                        ],
                        axis=1,
                    ).astype(jnp.int32)
                    is_rect = jnp.all(
                        jnp.sum(fmask.astype(jnp.int32), axis=(1, 2))
                        == sizes[:, 0] * sizes[:, 1]
                    )
                    ff = feats.astype(jnp.float32)
                    desc = jax.lax.cond(
                        is_rect,
                        lambda: netvlad_fused_rect(
                            ff, centroids, assign_w, assign_b, sizes=sizes
                        ),
                        lambda: netvlad_fused(
                            ff.reshape(ff.shape[0], -1, C),
                            centroids,
                            assign_w,
                            assign_b,
                            mask=fm,
                        ),
                    )
            else:
                desc = netvlad_aggregate(
                    feats.astype(jnp.float32), centroids, assign_w, assign_b, mask=fm
                )
        else:
            if not (self.use_pallas and self.pooling == "gem"
                    and not self.regional):
                # the fused Pallas head upcasts per-VMEM-chunk in-kernel;
                # casting here would materialize an f32 copy of the feature
                # map in HBM (measured ~7 ms/iter at b128 resnet50 @1024)
                feats = feats.astype(jnp.float32)
            if self.regional:
                # cirtorch Rpool (init_network regional=True): base pool
                # per R-MAC region, per-region L2N, the learned whitening
                # applied PER REGION (shared FC) when whiten_dim is set,
                # region sum, final L2N. Exact shapes only, like the
                # reference's bs=1 regime.
                if fmask is not None:
                    raise ValueError(
                        "regional pooling requires exact shapes (no "
                        "padding mask) — use ExtractConfig(exact=True)")
                rp = self.gem_p
                if self.pooling == "gem" and self.gem_p_trainable:
                    rp = self.param(
                        "gem_p",
                        lambda rng: jnp.asarray(self.gem_p, jnp.float32),
                    )
                whiten_fn = None
                if self.whiten_dim is not None:
                    whiten_fn = nn.Dense(self.whiten_dim, name="whiten")
                if return_regions:
                    # cirtorch extract_regional_vectors: per-region vectors
                    # [B, R, D] (already per-region L2N'd + whitened)
                    return rpool(feats, base=self.pooling, p=rp,
                                 whiten_fn=whiten_fn, aggregate=False)
                pooled = rpool(feats, base=self.pooling, p=rp,
                               whiten_fn=whiten_fn)
                return l2n(pooled)  # whitening already applied per region
            if self.pooling == "gem":
                if self.gem_p_trainable:
                    p = self.param(
                        "gem_p",
                        lambda rng: jnp.asarray(self.gem_p, jnp.float32),
                    )
                else:
                    p = self.gem_p
                if self.use_pallas:
                    # fused Pallas head; the masked variant requires the
                    # top-left-rectangle validity this framework's bucketing
                    # produces (arbitrary masks: set use_pallas=False)
                    from image_retrieval_for_image_based_localization_tpu.ops.pallas import (
                        gem_l2n_fused,
                        gem_l2n_fused_rect,
                    )

                    if fmask is None:
                        desc = gem_l2n_fused(feats, p)
                    else:
                        sizes = jnp.stack(
                            [
                                jnp.sum(jnp.any(fmask, axis=2), axis=1),
                                jnp.sum(jnp.any(fmask, axis=1), axis=1),
                            ],
                            axis=1,
                        ).astype(jnp.int32)
                        desc = gem_l2n_fused_rect(feats, p, sizes)
                    # fused kernel already L2-normalizes; skip head norm below
                    if self.whiten_dim is not None:
                        desc = nn.Dense(self.whiten_dim, name="whiten")(desc)
                        desc = l2n(desc)
                    return desc
                pooled = gem(feats, p, mask=fmask)
            elif self.pooling == "gemmp":
                # cirtorch GeMmp: one learnable exponent PER CHANNEL
                # (always trainable there); gem() broadcasts a [C] p
                pmp = self.param(
                    "gem_p",
                    lambda rng: jnp.full(
                        (feats.shape[-1],), self.gem_p, jnp.float32),
                )
                pooled = gem(feats, pmp, mask=fmask)
            elif self.pooling == "mac":
                pooled = mac(feats, mask=fmask)
            elif self.pooling == "spoc":
                pooled = spoc(feats, mask=fmask)
            elif self.pooling == "rmac":
                if fmask is None:
                    pooled = rmac(feats)
                else:
                    # bucketed batches: per-image region grids from the
                    # valid (h, w) extents — reference-exact per image
                    # (ops.pooling.rmac_bucketed). Non-rectangular masks
                    # fall back to the padded-grid masked approximation.
                    from image_retrieval_for_image_based_localization_tpu.ops.pooling import (
                        rmac_bucketed,
                    )

                    sizes = jnp.stack(
                        [
                            jnp.sum(jnp.any(fmask, axis=2), axis=1),
                            jnp.sum(jnp.any(fmask, axis=1), axis=1),
                        ],
                        axis=1,
                    ).astype(jnp.int32)
                    is_rect = jnp.all(
                        jnp.sum(fmask.astype(jnp.int32), axis=(1, 2))
                        == sizes[:, 0] * sizes[:, 1]
                    )
                    pooled = jax.lax.cond(
                        is_rect,
                        lambda: rmac_bucketed(feats, sizes),
                        lambda: rmac(feats, mask=fmask),
                    )
            else:
                raise ValueError(f"unknown pooling {self.pooling!r}")
            desc = l2n(pooled)

        if self.whiten_dim is not None:
            desc = nn.Dense(self.whiten_dim, name="whiten")(desc)
            desc = l2n(desc)
        return desc


def create_model(
    arch: str = "resnet50",
    pooling: str = "gem",
    whiten_dim: Optional[int] = None,
    **kw,
) -> RetrievalNet:
    """Factory mirroring the reference's ``init_network(params)``."""
    return RetrievalNet(arch=arch, pooling=pooling, whiten_dim=whiten_dim, **kw)
