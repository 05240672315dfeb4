"""Query expansion: αQE / average-QE re-querying — a beyond-parity booster.

After an initial search, each query descriptor is replaced by the
l2-normalized weighted sum of itself and its top-nQE neighbors' gallery
descriptors, with weights ``w_i = max(s_i, 0)^α`` (Radenović et al., TPAMI
2018 — the cirtorch lineage the reference builds on; ``α = 0`` degenerates
to classic average query expansion). The reference framework itself ships
no QE, so this raises mAP over its own eval stack at the cost of one extra
(tiny) search per batch.

TPU shape: one jitted program — the nQE search streams the HBM-resident
gallery through the MXU (``knn.streaming_topk``), the neighbor gather and
the ``[Nq, nqe] x [Nq, nqe, D]`` weighted reduction stay on device, and the
re-normalized queries come back ready for the main ranking pass. Everything
operates in the index's search space (post-whitening): expansion must
average the descriptors that are actually being ranked.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from image_retrieval_for_image_based_localization_tpu.retrieval.knn import (
    knn_search,
)


@functools.partial(jax.jit, static_argnames=("nqe",))
def expand_queries(
    gallery: jnp.ndarray,
    queries: jnp.ndarray,
    nqe: int = 50,
    alpha: float = 3.0,
) -> jnp.ndarray:
    """αQE: return expanded, re-l2-normalized queries ``[Nq, D]``.

    ``gallery`` and ``queries`` must live in the same (search) space —
    i.e. post-whitening if the index whitens. ``alpha`` is traced, so
    sweeping it does not recompile; ``nqe`` is static (it sets the top-k
    program shape).
    """
    q = jnp.asarray(queries, jnp.float32)
    scores, idx = knn_search(gallery, q, k=nqe)
    # neighbors come back f32 regardless of gallery storage dtype; int8
    # storage is symmetric *127 quantization (retrieval.index), so the
    # gathered rows must be rescaled to cosine range or the sum drowns
    # the query's own contribution ~127x
    nbrs = jnp.take(jnp.asarray(gallery), idx, axis=0).astype(jnp.float32)
    if jnp.asarray(gallery).dtype == jnp.int8:
        nbrs = nbrs * (1.0 / 127.0)
    w = jnp.maximum(scores, 0.0) ** jnp.asarray(alpha, jnp.float32)
    expanded = q + jnp.einsum(
        "qn,qnd->qd", w, nbrs, preferred_element_type=jnp.float32
    )
    norm = jnp.linalg.norm(expanded, axis=1, keepdims=True)
    return expanded / jnp.maximum(norm, 1e-6)


def expand_queries_host(
    gallery_rows, queries, scores, alpha: float = 3.0
):
    """Host-side expansion from pre-gathered neighbor rows — used when the
    initial search ran on a *sharded* gallery (the [Nq, nqe] neighbor rows
    are tiny next to the gallery, so the host math costs nothing).

    ``gallery_rows``: [Nq, nqe, D] gathered neighbor descriptors;
    ``scores``: [Nq, nqe] their similarities. Returns [Nq, D] numpy.
    """
    import numpy as np

    q = np.asarray(queries, np.float32)
    w = np.maximum(np.asarray(scores, np.float32), 0.0) ** float(alpha)
    expanded = q + np.einsum(
        "qn,qnd->qd", w, np.asarray(gallery_rows, np.float32)
    )
    norm = np.linalg.norm(expanded, axis=1, keepdims=True)
    return expanded / np.maximum(norm, 1e-6)


def expand_via_sharded(sindex, gallery, queries, nqe: int, alpha: float = 3.0):
    """αQE when the initial search runs on a SHARDED gallery: the nQE
    search is distributed, the tiny ``[Nq, nqe]`` neighbor rows are
    gathered from the host f32 ``gallery``, and the expansion math runs
    host-side. Returns PRE-TRANSFORMED expanded queries (they already
    live in the index search space) — pass ``pre_transformed=True`` to
    the follow-up sharded query/rank call.

    Single implementation shared by the query CLI and the sharded
    evaluation harness (they must never drift)."""
    import numpy as np

    nqe = min(int(nqe), sindex.n_valid)
    s0, i0 = sindex.query(queries, k=nqe)
    qt = np.asarray(sindex.transform_queries(queries))
    return expand_queries_host(np.asarray(gallery)[i0], qt, s0, alpha=alpha)
