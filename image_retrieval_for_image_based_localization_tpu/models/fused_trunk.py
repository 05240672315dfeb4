"""Inference-fused ResNet bottleneck trunk (functional, BN-folded).

The XLA-scheduled trunk materializes every conv output in HBM; at 1024px
the early stages are traffic-bound (PERF.md "Trace decomposition"). This
module runs the same trunk from the same flax variables with every
stride-1 identity-skip bottleneck executed by the VMEM-resident Pallas
kernel (``ops.pallas.bottleneck_block``), and the few non-fusable pieces
(stem, maxpool, each stage's strided/downsample first block) as plain
``lax.conv`` with the BatchNorm folded in.

Inference-only by construction (BN running stats folded into weights —
exact linear algebra, not an approximation; see ``fold_bn``). Training and
non-bottleneck archs use the flax trunk. Wired into the Extractor via
``ExtractConfig.fuse_blocks``; RetrievalNet consumes the resulting feature
map through its ``precomputed_features`` path so the descriptor head (and
its parameters) stay single-sourced.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from image_retrieval_for_image_based_localization_tpu.models.resnet import (
    RESNET_SPECS,
)
from image_retrieval_for_image_based_localization_tpu.ops.pallas.bottleneck_block import (
    bottleneck_fused,
    fold_bn,
)

BN_EPS = 1e-5


def _fold_cb(p: Dict, s: Dict) -> Tuple[np.ndarray, np.ndarray]:
    """Fold one _ConvBN submodule's params+stats into (W_folded, b_folded)."""
    w, b = fold_bn(
        jnp.asarray(p["conv"]["kernel"]),
        jnp.asarray(p["bn"]["scale"]),
        jnp.asarray(p["bn"]["bias"]),
        jnp.asarray(s["bn"]["mean"]),
        jnp.asarray(s["bn"]["var"]),
        BN_EPS,
    )
    return np.asarray(w), np.asarray(b)


def fold_trunk_variables(variables: Dict[str, Any], arch: str) -> Dict[str, Any]:
    """Fold the trunk's conv+BN pairs once (host-side, f32).

    Accepts full RetrievalNet variables ({'params': {'trunk': ...}, ...}) or
    a bare trunk tree. Returns a plain dict of folded numpy weights keyed by
    the flax module names.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    if "trunk" in params:
        params = params["trunk"]
        stats = stats.get("trunk", {})
    block_kind, stages, _ = RESNET_SPECS[arch]
    if block_kind != "bottleneck":
        raise ValueError(f"fused trunk supports bottleneck resnets only, not {arch}")

    folded: Dict[str, Any] = {"stem": _fold_cb(params["stem"], stats["stem"])}
    for stage_i, depth in enumerate(stages):
        for block_i in range(depth):
            name = f"layer{stage_i + 1}_{block_i}"
            bp, bs = params[name], stats[name]
            entry = {k: _fold_cb(bp[k], bs[k]) for k in bp}
            folded[name] = entry
    folded["_arch"] = arch
    return folded


def _conv(x, w, b, stride: int, pad: int):
    """BN-folded conv: NHWC lax conv in x.dtype with f32 accumulation."""
    y = jax.lax.conv_general_dilated(
        x,
        jnp.asarray(w, x.dtype),
        (stride, stride),
        ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + jnp.asarray(b, jnp.float32)
    return y


def _first_block(x, entry, stride: int):
    """A stage's strided/projecting first bottleneck via XLA convs.

    Every conv output is cast straight back to the compute dtype (as the
    flax path does after BatchNorm) — keeping the [B,H,W,4C] temporaries in
    f32 doubles HBM footprint and OOMs at b128/1024px.
    """
    dt = x.dtype
    y = jnp.maximum(_conv(x, *entry["cb1"], 1, 0), 0.0).astype(dt)
    y = jnp.maximum(_conv(y, *entry["cb2"], stride, 1), 0.0).astype(dt)
    y = _conv(y, *entry["cb3"], 1, 0).astype(dt)
    identity = _conv(x, *entry["down"], stride, 0).astype(dt)
    return jnp.maximum(y + identity, 0.0)  # bf16 add, as the flax block does


def trunk_apply_fused(
    folded: Dict[str, Any], x: jnp.ndarray, interpret: bool | None = None
) -> jnp.ndarray:
    """Run the folded trunk: stem/maxpool + first blocks on XLA, all other
    bottlenecks through the fused Pallas kernel. x: NHWC image batch."""
    arch = folded["_arch"]
    _, stages, _ = RESNET_SPECS[arch]
    dt = x.dtype

    y = jnp.maximum(_conv(x, *folded["stem"], 2, 3), 0.0).astype(dt)
    y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-np.inf)
    y = jax.lax.reduce_window(
        y, -np.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )

    for stage_i, depth in enumerate(stages):
        for block_i in range(depth):
            entry = folded[f"layer{stage_i + 1}_{block_i}"]
            if block_i == 0:
                stride = 2 if stage_i > 0 else 1
                y = _first_block(y, entry, stride)
            else:
                (w1, b1), (w2, b2), (w3, b3) = (
                    entry["cb1"], entry["cb2"], entry["cb3"],
                )
                y = bottleneck_fused(
                    y,
                    jnp.asarray(w1)[0, 0], jnp.asarray(b1),
                    jnp.asarray(w2), jnp.asarray(b2),
                    jnp.asarray(w3)[0, 0], jnp.asarray(b3),
                    interpret=interpret,
                )
    return y
