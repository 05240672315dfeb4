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
import jax.numpy as jnp

# (block, layers-per-stage, expansion)
RESNET_SPECS = {
    "resnet18": ("basic", (2, 2, 2, 2), 1),
    "resnet34": ("basic", (3, 4, 6, 3), 1),
    "resnet50": ("bottleneck", (3, 4, 6, 3), 4),
    "resnet101": ("bottleneck", (3, 4, 23, 3), 4),
    "resnet152": ("bottleneck", (3, 8, 36, 3), 4),
}


class _ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm, torchvision-parameter-compatible."""

    features: int
    kernel: int
    stride: int = 1
    pad: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
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

    @property
    def out_channels(self) -> int:
        _, _, expansion = RESNET_SPECS[self.arch]
        return 512 * expansion

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_kind, stages, _ = RESNET_SPECS[self.arch]
        block = BasicBlock if block_kind == "basic" else Bottleneck

        x = _ConvBN(64, 7, 2, 3, self.dtype, name="stem")(x, train)
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
