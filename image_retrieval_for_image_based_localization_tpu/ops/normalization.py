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
    """L2-normalize ``x`` along ``axis``: ``x / (||x||_2 + eps)``.

    The squared norm is floored at 1e-24 before the sqrt: for any row with
    ``||x|| >= 1e-12`` the forward is bit-identical to ``sqrt(sum(x^2))``,
    but an exactly-zero row no longer produces a ``0/0`` NaN in the VJP
    (``d sqrt(s)/ds -> inf`` at s=0). NetVLAD hits this for real: with the
    paper's alpha=100 assignment init whole clusters get exactly-zero soft
    mass in an image, the intra-norm row is exactly zero, and one train
    step NaNs every gradient upstream of the head.
    """
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(sq, 1e-24))
    return x / (norm + eps)


def powerlaw(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Power-law (signed square-root) normalization — the cirtorch
    ``layers/functional.py::powerlaw`` semantics: ``x += eps`` then
    ``sign(x) * sqrt(|x|)``. Flattens bursty descriptor dimensions;
    typically followed by :func:`l2n`."""
    x = x + eps
    return jnp.sign(x) * jnp.sqrt(jnp.abs(x))
