"""Flax SqueezeNet 1.1 trunk — NHWC.

cirtorch-lineage arch option (SURVEY.md §2; empty reference mount):
torchvision ``squeezenet1_1().features`` (fire modules: squeeze 1x1 →
expand 1x1 ∥ expand 3x3, channel-concat), output 512 channels; parameters
port via ``models.torch_port.port_squeezenet_trunk``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class Fire(nn.Module):
    squeeze: int
    expand1: int
    expand3: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = nn.relu(nn.Conv(self.squeeze, (1, 1), dtype=self.dtype, name="squeeze")(x))
        e1 = nn.relu(nn.Conv(self.expand1, (1, 1), dtype=self.dtype, name="expand1")(s))
        e3 = nn.relu(
            nn.Conv(
                self.expand3, (3, 3), padding=((1, 1), (1, 1)),
                dtype=self.dtype, name="expand3",
            )(s)
        )
        return jnp.concatenate([e1, e3], axis=-1)


# squeezenet1_1 fire parameters: (squeeze, expand1x1, expand3x3)
FIRES = ((16, 64, 64), (16, 64, 64), (32, 128, 128), (32, 128, 128),
         (48, 192, 192), (48, 192, 192), (64, 256, 256), (64, 256, 256))
# max-pools come after conv0 and after fires 1 and 3 (0-indexed)
_POOL_AFTER = {1, 3}


def _max_pool_ceil(x):
    """torchvision's MaxPool2d(3, 2, ceil_mode=True): emulate ceil by
    right-padding one row/col (with -inf, which nn.max_pool uses) whenever
    (dim - 3) is odd — computed from static shapes at trace time."""
    h, w = x.shape[1], x.shape[2]
    ph = (h - 3) % 2
    pw = (w - 3) % 2
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((0, ph), (0, pw)))


class SqueezeNetTrunk(nn.Module):
    arch: str = "squeezenet1_1"
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> int:
        return 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        x = nn.Conv(
            64, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype, name="conv0"
        )(x)
        x = nn.relu(x)
        x = _max_pool_ceil(x)
        for i, (sq, e1, e3) in enumerate(FIRES):
            x = Fire(sq, e1, e3, self.dtype, name=f"fire{i}")(x)
            if i in _POOL_AFTER:
                x = _max_pool_ceil(x)
        return x
