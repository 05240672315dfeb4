"""Hard-negative mining for contrastive/triplet training.

The reference re-mines tuples every epoch (`create_epoch_tuples`,
SURVEY.md §3.2/§3.5; cirtorch lineage — empty reference mount): sample
``qsize`` query pairs and a ``poolsize`` negative pool, re-extract
descriptors with the current model, kNN-search each query against the pool,
and pick the hardest negatives whose cluster differs from the query's (at
most one negative per cluster).

TPU-native differences: mining reuses the framework's batched extractor and
the device-side streaming top-k (``retrieval.knn.knn_search``) instead of a
host argsort, and the cluster-exclusion filter is vectorized NumPy over the
[Nq, k] candidate lists (the reference's per-query Python loop is O(Nq*k)
interpreter work — at 120k-pool scale that's minutes; the vectorized filter
is milliseconds and bit-identical, see tests/test_training.py).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from image_retrieval_for_image_based_localization_tpu.retrieval.knn import knn_search


@dataclasses.dataclass
class TupleSet:
    """Epoch tuples: for each query, one positive and ``n_neg`` negatives."""

    qidxs: np.ndarray   # [Nq] pool indices of queries
    pidxs: np.ndarray   # [Nq] pool indices of positives
    nidxs: np.ndarray   # [Nq, n_neg] pool indices of mined negatives


def _filter_candidates(
    cand: np.ndarray,
    qidxs: np.ndarray,
    pidxs: np.ndarray,
    clusters: Optional[np.ndarray],
    n_neg: int,
) -> np.ndarray:
    """Vectorized reference filter over ranked candidates ``cand [Nq, k]``:
    drop the query itself and its positive, drop same-cluster-as-query, keep
    at most one negative per cluster (first = hardest wins), take the first
    ``n_neg`` survivors in rank order. Returns [Nq, n_neg] (-1 = shortfall).

    Equivalent to the reference's sequential scan: every valid candidate
    with an unseen cluster is picked until n_neg, so "first occurrence among
    valid candidates, truncated to n_neg" is the same set in the same order.
    """
    Nq, k = cand.shape
    valid = (cand != qidxs[:, None]) & (cand != pidxs[:, None])
    if clusters is not None:
        clusters = np.asarray(clusters, np.int64)
        ccl = clusters[cand]
        valid &= ccl != clusters[qidxs][:, None]
        # first occurrence per (row, cluster) among VALID candidates, in
        # candidate order: give invalid slots a unique sentinel key so they
        # never claim a cluster, then mark key-changes in a stable sort.
        ncl = int(clusters.max()) + 1
        rows64 = np.arange(Nq, dtype=np.int64)[:, None]
        key = rows64 * ncl + ccl
        sentinel = Nq * np.int64(ncl) + rows64 * k + np.arange(k, dtype=np.int64)
        key = np.where(valid, key, sentinel)
        order = np.argsort(key, axis=1, kind="stable")  # ties keep rank order
        sk = np.take_along_axis(key, order, axis=1)
        first_sorted = np.concatenate(
            [np.ones((Nq, 1), bool), sk[:, 1:] != sk[:, :-1]], axis=1
        )
        first = np.empty_like(valid)
        np.put_along_axis(first, order, first_sorted, axis=1)
        valid &= first

    rank = np.cumsum(valid, axis=1) - 1
    out = np.full((Nq, n_neg), -1, np.int64)
    rows, cols = np.nonzero(valid & (rank < n_neg))
    out[rows, rank[rows, cols]] = cand[rows, cols]
    return out


def mine_hard_negatives(
    pool_vecs: np.ndarray,
    qidxs: Sequence[int],
    pidxs: Sequence[int],
    clusters: Optional[np.ndarray] = None,
    n_neg: int = 5,
    pool_topk: int = 200,
    seed: int = 0,
    neg_pool: Optional[np.ndarray] = None,
) -> TupleSet:
    """Pick the hardest negatives per query from pool descriptors.

    Args:
      pool_vecs: [N, D] L2-normalized pool descriptors (current model).
        Only rows in ``neg_pool`` (or all rows) and ``qidxs`` are read.
      qidxs/pidxs: matching query/positive pool indices (from 3D clusters in
        the reference's retrieval-SfM data; any supervision source works).
      clusters: [N] cluster id per pool image; negatives must come from a
        different cluster than the query (reference semantics). None -> only
        the query itself and its positive are excluded.
      n_neg: negatives per query (reference default 5).
      pool_topk: how many nearest pool images to consider per query.
      seed: RNG seed for the degenerate-pool random filler — seeded so
        epochs are reproducible (pass the epoch number).
      neg_pool: optional [M] pool indices eligible as negatives (the
        reference's per-epoch ``poolsize`` sample). Default: every row.
    """
    rng = np.random.RandomState(seed)
    qidxs = np.asarray(qidxs)
    pidxs = np.asarray(pidxs)
    N = pool_vecs.shape[0]
    if neg_pool is None:
        gallery = pool_vecs
        k = min(pool_topk, N)
    else:
        neg_pool = np.asarray(neg_pool)
        gallery = pool_vecs[neg_pool]
        k = min(pool_topk, len(neg_pool))
    _, idx = knn_search(jnp.asarray(gallery), jnp.asarray(pool_vecs[qidxs]), k=k)
    cand = np.asarray(idx, np.int64)
    if neg_pool is not None:
        cand = neg_pool[cand]  # back to global pool indices

    nidxs = _filter_candidates(
        cand, qidxs, pidxs,
        None if clusters is None else np.asarray(clusters), n_neg,
    )
    # degenerate tiny pools: fill shortfalls with random non-q/p images.
    # Bounded retries: a degenerate sample (e.g. poolsize 1-2 that is
    # exactly {q, p}) must not spin forever, so after the retry budget fall
    # back to a deterministic scan of the global pool for any non-q/p index.
    short_rows = np.nonzero((nidxs < 0).any(axis=1))[0]
    for qi in short_rows:
        picked = [int(v) for v in nidxs[qi] if v >= 0]
        tries = 0
        while len(picked) < n_neg and tries < 64:
            tries += 1
            filler = (
                rng.randint(0, N)
                if neg_pool is None
                else int(neg_pool[rng.randint(0, len(neg_pool))])
            )
            if filler != qidxs[qi] and filler != pidxs[qi]:
                picked.append(filler)
        if len(picked) < n_neg:
            fallback = [
                i for i in range(N) if i != qidxs[qi] and i != pidxs[qi]
            ]
            if not fallback:
                raise ValueError(
                    "mining pool contains only the query and its positive; "
                    "cannot fill negatives"
                )
            while len(picked) < n_neg:
                picked.append(fallback[len(picked) % len(fallback)])
        nidxs[qi] = picked
    return TupleSet(qidxs=qidxs, pidxs=pidxs, nidxs=nidxs)


def mine_epoch_tuples(
    extract: Callable[[Sequence[str]], np.ndarray],
    paths: Sequence[str],
    qidxs: np.ndarray,
    pidxs: np.ndarray,
    clusters: Optional[np.ndarray] = None,
    n_neg: int = 5,
    pool_topk: int = 200,
    seed: int = 0,
    qsize: Optional[int] = None,
    poolsize: Optional[int] = None,
) -> TupleSet:
    """Reference-style per-epoch tuple creation with sampling.

    Mirrors `create_epoch_tuples` (SURVEY.md §3.5): draw ``qsize`` query
    pairs and a ``poolsize`` negative pool for this epoch (seeded by the
    epoch number), extract descriptors ONLY for the union of sampled rows
    (at 120k-pool scale this is what keeps re-mining affordable: the default
    reference sampling extracts ~22k images, not 120k), then mine.
    Returned indices are global pool indices.
    """
    rng = np.random.RandomState(seed)
    qidxs = np.asarray(qidxs)
    pidxs = np.asarray(pidxs)
    if qsize is not None and qsize < len(qidxs):
        sel = np.sort(rng.choice(len(qidxs), qsize, replace=False))
        qidxs, pidxs = qidxs[sel], pidxs[sel]
    N = len(paths)
    if poolsize is not None and poolsize < N:
        neg_pool = np.sort(rng.choice(N, poolsize, replace=False))
    else:
        neg_pool = np.arange(N)

    union = np.unique(np.concatenate([qidxs, pidxs, neg_pool]))
    vecs = extract([paths[int(i)] for i in union])
    remap = np.full(N, -1, np.int64)
    remap[union] = np.arange(len(union))
    ts = mine_hard_negatives(
        vecs,
        remap[qidxs],
        remap[pidxs],
        clusters=None if clusters is None else np.asarray(clusters)[union],
        n_neg=n_neg,
        pool_topk=pool_topk,
        seed=seed,
        neg_pool=remap[neg_pool],
    )
    return TupleSet(qidxs=qidxs, pidxs=pidxs, nidxs=union[ts.nidxs])
