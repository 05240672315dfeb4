"""Multi-chip IVF: coarse-quantized approximate search over a
cluster-sharded gallery.

``retrieval.ivf`` bounds per-query HBM traffic to ``nprobe/C`` of the
gallery; this module removes the remaining single-chip limit — HBM
*capacity* — by sharding the padded partition tensor ``[C, L, D]`` over
the mesh's ``gallery`` axis (each chip owns ``C/shards`` whole clusters).
The reference has no analog (single-GPU brute force); the design follows
``parallel.sharded_index`` (SURVEY.md §2.2): big tensors stay put, only
tiny per-query arrays ride ICI.

Search (one ``shard_map``-ed program, global-nprobe semantics):
  1. every chip scores the queries against its LOCAL centroids and
     all-gathers the coarse scores — ``[nq, C]`` f32, tiny — so every
     chip knows the GLOBAL nprobe-th coarse score (the probe threshold);
  2. each chip selects only its own clusters that qualify (coarse score
     >= threshold; boundary ties over-include, never drop), gathers
     those partitions from LOCAL HBM, and exact-scores them — the gather
     is ``<= nprobe`` partitions per chip, usually far fewer since the
     global top-nprobe is spread across chips;
  3. per-chip (k-score, k-global-row) partials all-gather over ICI and a
     final merge applies the (score desc, row asc) tie contract.

The probed cluster set therefore EQUALS single-device
``IVFIndex.search``'s (modulo coarse-score boundary ties, which only add
clusters), so sharded results match single-device IVF on tie-free data,
and with ``nprobe == C`` match exact brute-force search — both pinned by
tests on the 8-virtual-device CPU mesh.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from image_retrieval_for_image_based_localization_tpu.parallel.sharded_index import (
    _put_global,
)

from image_retrieval_for_image_based_localization_tpu.retrieval.ivf import (
    NEG_INF,
    IVFIndex,
)


@functools.partial(
    jax.jit, static_argnames=("k", "nprobe", "mesh", "axis")
)
def sharded_ivf_search(
    centroids: jax.Array,   # [C, D]   P(axis, None)
    partitions: jax.Array,  # [C, L, D] P(axis, None, None)
    lengths: jax.Array,     # [C]      P(axis)
    row_ids: jax.Array,     # [C, L]   P(axis, None)
    queries: jax.Array,     # [nq, D]  replicated
    k: int,
    nprobe: int,
    mesh: Mesh,
    axis: str = "gallery",
) -> Tuple[jax.Array, jax.Array]:
    """Distributed IVF probe. Returns replicated ``(scores, rows) [nq,k]``.

    Pad clusters (C not divisible by shards) must have ``lengths == 0``;
    their coarse scores are masked to -inf so they never qualify.
    """
    n_shards = mesh.shape[axis]
    C = centroids.shape[0]
    C_l = C // n_shards
    L = partitions.shape[1]
    P_l = min(nprobe, C_l)          # max clusters any one chip can probe
    k_loc = min(k, P_l * L)

    def local_fn(cent_l, parts_l, len_l, ids_l, q):
        # 1. coarse scores, locally then gathered: [nq, C_l] -> [nq, C]
        cs_l = jax.lax.dot_general(
            q, cent_l, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        cs_l = jnp.where(len_l[None, :] > 0, cs_l, NEG_INF)
        cs = jax.lax.all_gather(cs_l, axis, axis=1, tiled=True)  # [nq, C]
        # global probe threshold: the nprobe-th best coarse score
        thresh = jax.lax.top_k(cs, min(nprobe, C))[0][:, -1]     # [nq]
        # 2. local qualifying clusters (static top-P_l, masked)
        qual = jnp.where(cs_l >= thresh[:, None], cs_l, NEG_INF)
        q_s, sel = jax.lax.top_k(qual, P_l)                      # [nq, P_l]
        active = q_s > NEG_INF / 2
        sub = jnp.take(parts_l, sel, axis=0)          # [nq, P_l, L, D]
        scale = None
        qq = q
        if parts_l.dtype == jnp.int8:
            sub = sub.astype(jnp.float32)
            scale = 1.0 / 127.0
        elif parts_l.dtype != qq.dtype:
            qq = qq.astype(parts_l.dtype)
        scores = jnp.einsum(
            "qd,qpld->qpl", qq, sub, preferred_element_type=jnp.float32)
        if scale is not None:
            scores = scores * scale
        valid = (
            jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
            < jnp.take(len_l, sel, axis=0)[:, :, None]
        ) & active[:, :, None]
        rows = jnp.take(ids_l, sel, axis=0)           # global row ids
        scores = jnp.where(valid, scores, NEG_INF)
        # pad slots: sentinel row ids, matching single-device IVF's fill
        # contract (no fabricated duplicate ids in the merged result)
        rows = jnp.where(valid, rows, jnp.iinfo(jnp.int32).max)
        nq = q.shape[0]
        s_loc, pos = jax.lax.top_k(scores.reshape(nq, -1), k_loc)
        r_loc = jnp.take_along_axis(rows.reshape(nq, -1), pos, axis=1)
        # 3. merge partials; final (score desc, row asc) tie contract
        s_all = jax.lax.all_gather(s_loc, axis, axis=1, tiled=True)
        r_all = jax.lax.all_gather(r_loc, axis, axis=1, tiled=True)
        s_top, pos = jax.lax.top_k(s_all, k)
        r_top = jnp.take_along_axis(r_all, pos, axis=1)
        order = jnp.lexsort((r_top, -s_top), axis=1)
        return (
            jnp.take_along_axis(s_top, order, axis=1),
            jnp.take_along_axis(r_top, order, axis=1),
        )

    return jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None, None), P(axis), P(axis, None),
                  P()),
        out_specs=(P(), P()),
        check_vma=False,
    )(centroids, partitions, lengths, row_ids, queries)


class ShardedIVF:
    """An ``IVFIndex`` whose partitions live sharded across the mesh."""

    def __init__(self, ivf: IVFIndex, mesh: Optional[Mesh] = None,
                 axis: str = "gallery"):
        from image_retrieval_for_image_based_localization_tpu.parallel.mesh import (
            default_mesh,
        )

        self.mesh = mesh if mesh is not None else default_mesh()
        self.axis = axis
        self.n = ivf.n
        n_shards = self.mesh.shape[axis]
        C = ivf.centroids.shape[0]
        pad = (-C) % n_shards
        cent, parts = ivf.centroids, ivf.partitions
        lengths, row_ids = ivf.lengths, ivf.row_ids
        if pad:  # pad clusters: zero rows, length 0 (masked at coarse stage)
            cent = np.concatenate(
                [cent, np.zeros((pad, cent.shape[1]), cent.dtype)])
            parts = np.concatenate(
                [parts, np.zeros((pad,) + parts.shape[1:], parts.dtype)])
            lengths = np.concatenate([lengths, np.zeros(pad, np.int32)])
            row_ids = np.concatenate(
                [row_ids, np.zeros((pad, row_ids.shape[1]), np.int32)])
        sh = lambda *spec: NamedSharding(self.mesh, P(*spec))
        # _put_global, not device_put: on a multi-process pod device_put
        # cannot address other hosts' devices (ShardedIndex's contract)
        self.centroids = _put_global(cent, sh(axis, None))
        self.partitions = _put_global(parts, sh(axis, None, None))
        self.lengths = _put_global(lengths, sh(axis))
        self.row_ids = _put_global(row_ids, sh(axis, None))

    def search(self, queries: np.ndarray, k: int = 10, nprobe: int = 8
               ) -> Tuple[np.ndarray, np.ndarray]:
        q = jnp.atleast_2d(jnp.asarray(queries, jnp.float32))
        q = _put_global(q, NamedSharding(self.mesh, P()))
        C = self.centroids.shape[0]
        L = self.partitions.shape[1]
        # same k clamp as single-device IVFIndex.search: at most
        # nprobe*L probed rows can exist per query
        k_eff = min(k, self.n, min(nprobe, C) * L)
        s, r = sharded_ivf_search(
            self.centroids, self.partitions, self.lengths, self.row_ids,
            q, k=k_eff, nprobe=min(nprobe, C),
            mesh=self.mesh, axis=self.axis,
        )
        from image_retrieval_for_image_based_localization_tpu.retrieval.knn import (
            sanitize_fill_rows,
        )

        s = np.asarray(s)
        return s, sanitize_fill_rows(s, r)
