"""Device-mesh construction.

The reference has no multi-device runtime (SURVEY.md §2.2: single-process,
optional single-host DataParallel). The TPU framework scales through a
``jax.sharding.Mesh`` with two logical axes:

  * ``data``: batch parallelism for extraction / training (gradient psum);
  * ``gallery``: the descriptor gallery sharded row-wise across chips —
    this is the framework's tensor/context-parallel analog (SURVEY.md §2.2,
    §5 "long-context"), and its collectives ride ICI.

On a pod, map ``gallery`` to the ICI-contiguous axis so the all-gather of
(k scores, k indices) per query stays intra-slice.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def create_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Tuple[str, ...] = ("data", "gallery"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a mesh over available devices.

    ``axis_sizes=None`` puts all devices on the last axis (pure gallery
    sharding). A ``-1`` entry is inferred from the device count.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = [1] * (len(axis_names) - 1) + [n]
    axis_sizes = list(axis_sizes)
    if -1 in axis_sizes:
        known = int(np.prod([s for s in axis_sizes if s != -1]))
        axis_sizes[axis_sizes.index(-1)] = n // known
    if int(np.prod(axis_sizes)) != n:
        raise ValueError(f"mesh {axis_sizes} != {n} devices")
    dev_array = np.asarray(devices).reshape(axis_sizes)
    return Mesh(dev_array, axis_names)


def default_mesh() -> Mesh:
    """All devices on the 'gallery' axis, data axis size 1."""
    return create_mesh()
