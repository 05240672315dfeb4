"""Training losses on L2-normalized descriptor space.

Reference parity (`layers/loss.py`, SURVEY.md §2; cirtorch lineage):

  * ``ContrastiveLoss(margin~0.7-0.85)`` over a tuple of descriptors with a
    +1/-1/(0 ignore) label per element:
      positive pairs: ``0.5 * d^2``; negatives: ``0.5 * max(0, margin-d)^2``
    where ``d = ||q - x||``.
  * ``TripletLoss(margin)``: ``max(0, m + d(q,p)^2 - d(q,n)^2)`` per negative.

Implemented batched over tuples: descriptors ``[B, T, D]`` where element 0 is
the query, 1 the positive, 2.. the negatives (reference tuple layout).
"""

from __future__ import annotations

import jax.numpy as jnp


def contrastive_loss(
    desc: jnp.ndarray, labels: jnp.ndarray, margin: float = 0.7, eps: float = 1e-6
) -> jnp.ndarray:
    """Contrastive loss over tuples.

    Args:
      desc: ``[B, T, D]`` L2-normalized descriptors; element 0 is the query.
      labels: ``[B, T]`` with +1 positive, -1 negative, 0 ignore (query slot).
    Returns scalar loss (sum over pairs, mean over batch).
    """
    q = desc[:, :1, :]                          # [B, 1, D]
    d2 = jnp.sum(jnp.square(desc - q), axis=-1)  # [B, T]
    d = jnp.sqrt(jnp.clip(d2, min=eps))
    pos = 0.5 * d2
    neg = 0.5 * jnp.square(jnp.clip(margin - d, min=0.0))
    per = jnp.where(labels > 0, pos, jnp.where(labels < 0, neg, 0.0))
    return jnp.mean(jnp.sum(per, axis=1))


def triplet_loss(desc: jnp.ndarray, margin: float = 0.1) -> jnp.ndarray:
    """Triplet loss over tuples ``[B, T, D]``: slot 0 query, 1 positive, 2.. negatives."""
    q = desc[:, 0, :]
    p = desc[:, 1, :]
    n = desc[:, 2:, :]
    dp2 = jnp.sum(jnp.square(q - p), axis=-1)          # [B]
    dn2 = jnp.sum(jnp.square(q[:, None, :] - n), axis=-1)  # [B, Nn]
    viol = jnp.clip(margin + dp2[:, None] - dn2, min=0.0)
    return jnp.mean(jnp.sum(viol, axis=1))
