"""Hard-negative mining for contrastive/triplet training.

The reference re-mines tuples every epoch (`create_epoch_tuples`,
SURVEY.md §3.2/§3.5; cirtorch lineage — empty reference mount): re-extract
pool descriptors with the current model, kNN-search each query against the
pool, and pick the hardest negatives whose cluster differs from the query's.

TPU-native difference: mining reuses the framework's fast batched extractor
and the device-side streaming top-k (``retrieval.knn.knn_search``) instead
of a host argsort — SURVEY.md §3.5: "fast extraction accelerates training,
not just serving". The cluster-exclusion filter runs on host over the tiny
top-k candidate lists.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np
import jax.numpy as jnp

from image_retrieval_for_image_based_localization_tpu.retrieval.knn import knn_search


@dataclasses.dataclass
class TupleSet:
    """Epoch tuples: for each query, one positive and ``n_neg`` negatives."""

    qidxs: np.ndarray   # [Nq] pool indices of queries
    pidxs: np.ndarray   # [Nq] pool indices of positives
    nidxs: np.ndarray   # [Nq, n_neg] pool indices of mined negatives


def mine_hard_negatives(
    pool_vecs: np.ndarray,
    qidxs: Sequence[int],
    pidxs: Sequence[int],
    clusters: Optional[np.ndarray] = None,
    n_neg: int = 5,
    pool_topk: int = 200,
    seed: int = 0,
) -> TupleSet:
    """Pick the hardest negatives per query from pool descriptors.

    Args:
      pool_vecs: [N, D] L2-normalized pool descriptors (current model).
      qidxs/pidxs: matching query/positive pool indices (from 3D clusters in
        the reference's retrieval-SfM data; any supervision source works).
      clusters: [N] cluster id per pool image; negatives must come from a
        different cluster than the query (reference semantics). None -> only
        the query itself and its positive are excluded.
      n_neg: negatives per query (reference default 5).
      pool_topk: how many nearest pool images to consider per query.
      seed: RNG seed for the degenerate-pool random filler — seeded so
        epochs are reproducible (pass the epoch number).
    """
    rng = np.random.RandomState(seed)
    qidxs = np.asarray(qidxs)
    pidxs = np.asarray(pidxs)
    N = pool_vecs.shape[0]
    k = min(pool_topk, N)
    scores, idx = knn_search(
        jnp.asarray(pool_vecs), jnp.asarray(pool_vecs[qidxs]), k=k
    )
    idx = np.asarray(idx)

    nidxs = np.zeros((len(qidxs), n_neg), dtype=np.int64)
    for qi, (q, cand) in enumerate(zip(qidxs, idx)):
        picked = []
        picked_clusters = []
        for c in cand:
            if c == q or c == pidxs[qi]:
                continue
            if clusters is not None:
                if clusters[c] == clusters[q]:
                    continue
                # reference picks at most one negative per cluster
                if clusters[c] in picked_clusters:
                    continue
            picked.append(c)
            if clusters is not None:
                picked_clusters.append(clusters[c])
            if len(picked) == n_neg:
                break
        while len(picked) < n_neg:  # degenerate tiny pools: wrap with random
            filler = rng.randint(0, N)
            if filler != q and filler != pidxs[qi]:
                picked.append(filler)
        nidxs[qi] = picked
    return TupleSet(qidxs=qidxs, pidxs=pidxs, nidxs=nidxs)
