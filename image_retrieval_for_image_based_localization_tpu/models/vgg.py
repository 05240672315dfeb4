"""Flax VGG trunk (VGG-16) — NHWC, TPU-native.

The reference strips torchvision VGG-16's classifier AND its final max-pool
(cirtorch lineage: `features.children()[:-1]`), leaving a stride-16,
512-channel trunk (`networks/imageretrievalnet.py`, SURVEY.md §2; reference
mount empty at survey time). Parameter structure maps 1:1 to torchvision's
`features.*` conv weights for checkpoint porting.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

# torchvision vgg16 cfg "D": numbers are conv widths, "M" is 2x2 maxpool
VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512)


class VGGTrunk(nn.Module):
    """VGG-16 feature trunk; final max-pool stripped (retrieval convention)."""

    arch: str = "vgg16"
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> int:
        return 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train  # VGG trunk has no BN in the torchvision "vgg16" variant
        conv_i = 0
        for v in VGG16_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(
                    int(v),
                    (3, 3),
                    padding=((1, 1), (1, 1)),
                    use_bias=True,
                    dtype=self.dtype,
                    name=f"conv{conv_i}",
                )(x)
                x = nn.relu(x)
                conv_i += 1
        return x
