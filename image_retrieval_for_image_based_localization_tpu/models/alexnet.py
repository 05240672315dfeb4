"""Flax AlexNet trunk — NHWC.

The cirtorch lineage the reference derives from supports AlexNet trunks
(`init_network` arch list, SURVEY.md §2; empty reference mount). Structure
matches torchvision's ``alexnet().features`` with the final max-pool
stripped (retrieval convention), output 256 channels at stride 16;
parameters port 1:1 via ``models.torch_port.port_alexnet_trunk``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

# (out_ch, kernel, stride, pad) per conv; 'M' = 3x3/2 max-pool
ALEXNET_CFG = (
    (64, 11, 4, 2),
    "M",
    (192, 5, 1, 2),
    "M",
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)


class AlexNetTrunk(nn.Module):
    arch: str = "alexnet"
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> int:
        return 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        conv_i = 0
        for v in ALEXNET_CFG:
            if v == "M":
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
            else:
                ch, k, s, p = v
                x = nn.Conv(
                    ch,
                    (k, k),
                    strides=(s, s),
                    padding=((p, p), (p, p)),
                    use_bias=True,
                    dtype=self.dtype,
                    name=f"conv{conv_i}",
                )(x)
                x = nn.relu(x)
                conv_i += 1
        return x
