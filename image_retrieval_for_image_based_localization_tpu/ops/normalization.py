"""L2 normalization.

Reference parity: cirtorch-lineage ``L2N`` / ``l2n()`` divides by
``norm + eps`` (NOT ``max(norm, eps)``) with ``eps=1e-6``; the reference's
`layers/normalization.py` follows the same convention (SURVEY.md §2 — the
reference mount was empty, semantics reconstructed from the cirtorch
lineage the reference derives from).
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-6


def l2n(x: jnp.ndarray, axis: int = -1, eps: float = EPS) -> jnp.ndarray:
    """L2-normalize ``x`` along ``axis``: ``x / (||x||_2 + eps)``."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / (norm + eps)


def powerlaw(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Power-law (signed square-root) normalization — the cirtorch
    ``layers/functional.py::powerlaw`` semantics: ``x += eps`` then
    ``sign(x) * sqrt(|x|)``. Flattens bursty descriptor dimensions;
    typically followed by :func:`l2n`."""
    x = x + eps
    return jnp.sign(x) * jnp.sqrt(jnp.abs(x))
