"""Flax ResNet trunks (18/34/50/101/152) — NHWC, TPU-native.

The reference builds its trunk from torchvision ResNets with the classifier
lopped off (`networks/imageretrievalnet.py`, SURVEY.md §2 — reference mount
empty; structure from the cirtorch lineage). This is a from-scratch Flax
implementation that keeps torchvision's *graph* (conv7x7/2 → bn → relu →
maxpool3x3/2 → layer1..4) and parameter structure so PyTorch checkpoints
port losslessly (see ``models.torch_port``), while layout and execution are
TPU-native: NHWC, explicit static padding, XLA-fused conv+BN+ReLU, optional
bfloat16 compute with float32 params.

The trunk ends at layer4 (stride 32) — no avgpool/fc — because the
descriptor head does the pooling.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# (block, layers-per-stage, expansion)
RESNET_SPECS = {
    "resnet18": ("basic", (2, 2, 2, 2), 1),
    "resnet34": ("basic", (3, 4, 6, 3), 1),
    "resnet50": ("bottleneck", (3, 4, 6, 3), 4),
    "resnet101": ("bottleneck", (3, 4, 23, 3), 4),
    "resnet152": ("bottleneck", (3, 8, 36, 3), 4),
}


class _S2DConv7x7s2(nn.Module):
    """The 7x7/stride-2 stem conv, executed as space-to-depth(2) + 4x4/s1.

    The parameter is the STANDARD [7, 7, Cin, F] kernel at the standard
    tree path (``.../conv/kernel``, lecun-normal init — identical to
    ``nn.Conv``), so checkpoints, the torch port, and training are all
    unchanged; only the *computation* is rewritten at apply time:

        y[i,j] = Σ_{u,v,c} W[u,v,c] x[2i+u-3, 2j+v-3, c]
               = Σ_{p,q,r,s,c} W4[p+2,q+2,(r,s,c)] X[i+p, j+q, (r,s,c)]

    with ``X`` the 2x2-packed input ([B,H/2,W/2,4C], channel order
    (row-parity r, col-parity s, c)) and ``W4[p+2,q+2,(r,s,c)] =
    W[2p+r+3, 2q+s+3, c]`` (zero where 2p+r+3 is outside [0,7)). The map
    u -> (p, r) = divmod(u-3, 2) is a bijection, so the rewrite is exact
    up to f32 accumulation order. Zero spatial padding commutes with the
    packing when H and W are even (bucketed batches are multiples of 32),
    so conv-level padding ((2,1),(2,1)) reproduces pad=3 exactly; odd
    inputs fall back to the direct 7x7 conv with the same parameter.

    Why: at 1024px/b128 the trace (PERF.md round-4) pins the stem chain at
    ~23 ms/iter with the 7x7 C=3 conv running far under MXU rate — 3 input
    channels give XLA a K=147 contraction it handles with small-channel
    emitters at ~38% of peak. The packed form quadruples the input
    features (K=192, spatial dims halved).

    Measured outcome (hardware A/B, PERF.md round 4): a 2.7% NET LOSS at
    the production shape (546.8 -> 532.0 img/s) — the [B,H,W,3] ->
    [B,H/2,W/2,12] pack transpose costs more than the contraction-geometry
    change saves against XLA's specialized small-channel conv emitters.
    Kept opt-in (``ModelConfig.s2d_stem``) for other rigs/shapes; exact by
    construction, pinned by tests either way.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, cin, self.features),
        )
        x = x.astype(self.dtype)
        w = kernel.astype(self.dtype)
        B, H, W, C = x.shape
        if H % 2 or W % 2:  # odd shapes: direct conv, same parameter
            return jax.lax.conv_general_dilated(
                x, w, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        w4 = jnp.zeros((4, 4, 4 * C, self.features), w.dtype)
        for u in range(7):
            p, r = divmod(u - 3, 2)
            for v in range(7):
                q, s = divmod(v - 3, 2)
                ch = (r * 2 + s) * C
                w4 = w4.at[p + 2, q + 2, ch:ch + C, :].set(w[u, v])
        xp = x.reshape(B, H // 2, 2, W // 2, 2, C)
        xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
        return jax.lax.conv_general_dilated(
            xp, w4, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class _ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm, torchvision-parameter-compatible."""

    features: int
    kernel: int
    stride: int = 1
    pad: int = 0
    dtype: Any = jnp.float32
    s2d: bool = False  # 7x7/s2 only: space-to-depth rewrite (_S2DConv7x7s2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.s2d and self.kernel == 7 and self.stride == 2 and self.pad == 3:
            x = _S2DConv7x7s2(self.features, self.dtype, name="conv")(x)
        else:
            x = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=((self.pad, self.pad), (self.pad, self.pad)),
                use_bias=False,
                dtype=self.dtype,
                name="conv",
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)
        return x


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = _ConvBN(self.features, 3, self.stride, 1, self.dtype, name="cb1")(x, train)
        out = nn.relu(out)
        out = _ConvBN(self.features, 3, 1, 1, self.dtype, name="cb2")(out, train)
        if self.downsample:
            identity = _ConvBN(self.features, 1, self.stride, 0, self.dtype, name="down")(
                x, train
            )
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is features * 4
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = _ConvBN(self.features, 1, 1, 0, self.dtype, name="cb1")(x, train)
        out = nn.relu(out)
        # torchvision places the stride on the 3x3 conv (ResNet v1.5)
        out = _ConvBN(self.features, 3, self.stride, 1, self.dtype, name="cb2")(out, train)
        out = nn.relu(out)
        out = _ConvBN(self.features * 4, 1, 1, 0, self.dtype, name="cb3")(out, train)
        if self.downsample:
            identity = _ConvBN(
                self.features * 4, 1, self.stride, 0, self.dtype, name="down"
            )(x, train)
        return nn.relu(out + identity)


class ResNetTrunk(nn.Module):
    """ResNet feature trunk: input NHWC image, output NHWC stride-32 features."""

    arch: str = "resnet50"
    dtype: Any = jnp.float32
    s2d_stem: bool = False  # exact stem rewrite, see _S2DConv7x7s2

    @property
    def out_channels(self) -> int:
        _, _, expansion = RESNET_SPECS[self.arch]
        return 512 * expansion

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_kind, stages, _ = RESNET_SPECS[self.arch]
        block = BasicBlock if block_kind == "basic" else Bottleneck

        x = _ConvBN(64, 7, 2, 3, self.dtype, s2d=self.s2d_stem,
                    name="stem")(x, train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        widths: Sequence[int] = (64, 128, 256, 512)
        for stage_i, (width, depth) in enumerate(zip(widths, stages)):
            for block_i in range(depth):
                stride = 2 if (stage_i > 0 and block_i == 0) else 1
                expansion = 1 if block_kind == "basic" else 4
                downsample = block_i == 0 and (
                    stride != 1 or x.shape[-1] != width * expansion
                )
                x = block(
                    width,
                    stride,
                    downsample,
                    self.dtype,
                    name=f"layer{stage_i + 1}_{block_i}",
                )(x, train)
        return x
