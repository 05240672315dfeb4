"""Flax DenseNet trunk (121/169/201/161) — NHWC.

cirtorch-lineage arch family (SURVEY.md §2; empty reference mount):
torchvision ``densenet*().features`` + final ReLU (the retrieval trunk
convention), output ``num_features`` channels at stride 32. Dense layers are
BN→ReLU→1x1→BN→ReLU→3x3 with channel concatenation; transitions halve
channels and avg-pool. Parameters port via
``models.torch_port.port_densenet_trunk``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

# (growth_rate, block_config, num_init_features)
DENSENET_SPECS = {
    "densenet121": (32, (6, 12, 24, 16), 64),
    "densenet169": (32, (6, 12, 32, 32), 64),
    "densenet201": (32, (6, 12, 48, 32), 64),
    "densenet161": (48, (6, 12, 36, 24), 96),
}


def densenet_out_channels(arch: str) -> int:
    growth, blocks, init = DENSENET_SPECS[arch]
    ch = init
    for i, n in enumerate(blocks):
        ch += n * growth
        if i < len(blocks) - 1:
            ch //= 2
    return ch


class _BN(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(x)


class DenseLayer(nn.Module):
    growth: int
    bn_size: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _BN(self.dtype, name="norm1")(x, train)
        h = nn.relu(h)
        h = nn.Conv(self.bn_size * self.growth, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(h)
        h = _BN(self.dtype, name="norm2")(h, train)
        h = nn.relu(h)
        h = nn.Conv(self.growth, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        return jnp.concatenate([x, h], axis=-1)


class Transition(nn.Module):
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _BN(self.dtype, name="norm")(x, train)
        x = nn.relu(x)
        x = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNetTrunk(nn.Module):
    arch: str = "densenet121"
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> int:
        return densenet_out_channels(self.arch)

    @nn.compact
    def __call__(self, x, train: bool = False):
        growth, blocks, init = DENSENET_SPECS[self.arch]
        x = nn.Conv(init, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv0")(x)
        x = _BN(self.dtype, name="norm0")(x, train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        ch = init
        for bi, n_layers in enumerate(blocks):
            for li in range(n_layers):
                x = DenseLayer(growth, dtype=self.dtype,
                               name=f"block{bi + 1}_layer{li + 1}")(x, train)
            ch += n_layers * growth
            if bi < len(blocks) - 1:
                ch //= 2
                x = Transition(ch, dtype=self.dtype, name=f"transition{bi + 1}")(x, train)
        x = _BN(self.dtype, name="norm5")(x, train)
        return nn.relu(x)  # cirtorch appends the final ReLU to features
