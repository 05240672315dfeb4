"""Multi-chip sharded gallery with distributed exact top-k.

This is the TPU-native replacement for the reference's host BLAS matmul +
argsort (SURVEY.md §3.1 hot loop 2) at gallery sizes that exceed one chip's
HBM (configs 4-5, BASELINE.json:10-11): the descriptor matrix is sharded
row-wise over the mesh's ``gallery`` axis and lives in HBM across chips.

Query path (inside one ``shard_map``-ed XLA program):
  1. every chip runs the streaming blocked-matmul top-k over its shard
     (``retrieval.knn.streaming_topk``) with global index bookkeeping;
  2. the (k scores, k global-indices) partials — tiny: k * 8 bytes per query
     per chip — are all-gathered over ICI;
  3. a final k-way merge with lower-index-wins tie-breaking selects the
     global top-k, identical to single-device results bitwise.

Queries are replicated across the gallery axis (they're small); batching
over the ``data`` axis composes orthogonally.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from image_retrieval_for_image_based_localization_tpu.retrieval.knn import (
    merge_topk,
    rank_candidates_core,
    streaming_topk,
)


@functools.partial(
    jax.jit, static_argnames=("k", "chunk", "n_valid", "mesh", "axis")
)
def sharded_knn(
    gallery: jax.Array,
    queries: jax.Array,
    k: int,
    mesh: Mesh,
    n_valid: int,
    chunk: int | None = None,
    axis: str = "gallery",
) -> Tuple[jax.Array, jax.Array]:
    """Distributed exact top-k over a row-sharded gallery.

    Args:
      gallery: ``[Ng_padded, D]`` sharded ``P(axis, None)`` (pad rows at the
        global end).
      queries: ``[Nq, D]`` replicated.
      n_valid: number of real gallery rows (pads masked to -inf).
    Returns replicated ``(scores [Nq, k], indices [Nq, k])``.
    """
    n_shards = mesh.shape[axis]
    local_rows = gallery.shape[0] // n_shards

    def local_fn(g_local, q):
        shard_id = jax.lax.axis_index(axis)
        offset = shard_id * local_rows
        # valid rows in this shard: clamp(n_valid - offset, 0, local_rows)
        local_valid = jnp.clip(n_valid - offset, 0, local_rows)
        s, i = streaming_topk(
            g_local,
            q,
            k=k,
            chunk=chunk,
            n_valid=local_valid,
            index_offset=offset,
        )
        # all-gather tiny partials over ICI, merge identically on every chip
        s_all = jax.lax.all_gather(s, axis, axis=1, tiled=True)  # [Nq, shards*k]
        i_all = jax.lax.all_gather(i, axis, axis=1, tiled=True)
        return merge_topk(s_all, i_all, k)

    in_specs = (P(axis, None), P())
    out_specs = (P(), P())
    # check_vma=False: the scan carry inside streaming_topk is initialized
    # from constants (replicated type) but updated from gallery-varying
    # values; the merged output is provably replicated (it follows an
    # all_gather over the full axis), so the static replication check is
    # overly conservative here.
    return jax.shard_map(
        local_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )(gallery, queries)


@functools.partial(jax.jit, static_argnames=("chunk", "n_valid", "mesh", "axis"))
def sharded_rank_candidates(
    gallery: jax.Array,
    queries: jax.Array,
    cand: jax.Array,
    mesh: Mesh,
    n_valid: int,
    chunk: int | None = None,
    axis: str = "gallery",
) -> jax.Array:
    """Distributed candidate ranking over a row-sharded gallery.

    The scale-correct evaluation path (replaces full ``k=N`` top-k merges):
    every shard counts how many of *its* gallery rows rank ahead of each
    candidate (``knn.rank_candidates_core``); counts psum over ICI — the
    only cross-chip traffic is the tiny [Nq, C] count/score arrays, and no
    ``[Ng, Nq]`` matrix ever exists on any host or chip.
    """
    n_shards = mesh.shape[axis]
    local_rows = gallery.shape[0] // n_shards

    def local_fn(g_local, q, cand_rep):
        shard_id = jax.lax.axis_index(axis)
        offset = shard_id * local_rows
        local_valid = jnp.clip(n_valid - offset, 0, local_rows)
        return rank_candidates_core(
            g_local,
            q,
            cand_rep,
            chunk=chunk,
            n_valid=local_valid,
            index_offset=offset,
            psum_axis=axis,
        )

    return jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P(), P()),
        out_specs=P(),
        check_vma=False,
    )(gallery, queries, cand)


def _put_global(arr, sharding) -> jax.Array:
    """Place a host array under a (possibly multi-process) sharding.

    Single-process: plain ``device_put``. Multi-process (``jax.distributed``
    initialized, e.g. a multi-host pod): ``device_put`` cannot address other
    hosts' devices, so the global array is assembled from per-process
    callbacks — every process supplies the index-slices it owns (each host
    passes the same host array; only the owned rows are read).
    """
    if jax.process_count() == 1:
        # keep already-on-device inputs on device (device-side reshard);
        # np.asarray here would round-trip every query batch through host
        return jax.device_put(jnp.asarray(arr), sharding)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])


class ShardedIndex:
    """A gallery sharded across the mesh's ``gallery`` axis, HBM-resident."""

    def __init__(
        self,
        gallery: np.ndarray,
        mesh: Optional[Mesh] = None,
        axis: str = "gallery",
        m: Optional[np.ndarray] = None,
        P_: Optional[np.ndarray] = None,
        dims: Optional[int] = None,
    ):
        from image_retrieval_for_image_based_localization_tpu.parallel.mesh import (
            default_mesh,
        )

        self.mesh = mesh if mesh is not None else default_mesh()
        self.axis = axis
        self.m, self.P, self.dims = m, P_, dims
        self.n_valid = int(gallery.shape[0])

        n_shards = self.mesh.shape[axis]
        pad = (-self.n_valid) % n_shards
        if pad:
            gallery = np.concatenate(
                [gallery, np.zeros((pad, gallery.shape[1]), gallery.dtype)], axis=0
            )
        sharding = NamedSharding(self.mesh, P(axis, None))
        self.gallery = _put_global(gallery, sharding)

    @classmethod
    def from_index(cls, index, mesh: Optional[Mesh] = None, axis: str = "gallery"):
        """Shard an existing single-device ``retrieval.Index``."""
        return cls(
            index.gallery, mesh=mesh, axis=axis, m=index.m, P_=index.P, dims=index.dims
        )

    def transform_queries(self, q: np.ndarray) -> jnp.ndarray:
        from image_retrieval_for_image_based_localization_tpu.ops.whitening import (
            whiten_apply,
        )

        q = jnp.asarray(q, jnp.float32)
        if self.P is None:
            return q
        return whiten_apply(q, jnp.asarray(self.m), jnp.asarray(self.P), self.dims)

    def save(self, path: str) -> None:
        """Persist as a regular Index artifact (gathers shards to host)."""
        from image_retrieval_for_image_based_localization_tpu.retrieval.index import (
            Index,
        )

        Index(
            gallery=np.asarray(self.gallery)[: self.n_valid],
            m=self.m,
            P=self.P,
            dims=self.dims,
        ).save(path)

    @classmethod
    def load(cls, path: str, mesh=None, axis: str = "gallery") -> "ShardedIndex":
        from image_retrieval_for_image_based_localization_tpu.retrieval.index import (
            Index,
        )

        return cls.from_index(Index.load(path), mesh=mesh, axis=axis)

    def rank_candidates(
        self,
        qdescriptors: np.ndarray,
        cand: np.ndarray,
        chunk: int | None = None,
        pre_transformed: bool = False,
    ) -> np.ndarray:
        """Global rank of each candidate row (``[Nq, C]`` int32) — the
        streaming mAP-evaluation path; see ``sharded_rank_candidates``.

        ``pre_transformed=True`` skips whitening (queries already live in
        the search space, e.g. αQE-expanded ones)."""
        q = (jnp.asarray(qdescriptors, jnp.float32) if pre_transformed
             else self.transform_queries(qdescriptors))
        rep = NamedSharding(self.mesh, P())
        q = _put_global(q, rep)
        cand_j = _put_global(np.asarray(cand, np.int32), rep)
        ranks = sharded_rank_candidates(
            self.gallery,
            q,
            cand_j,
            mesh=self.mesh,
            n_valid=self.n_valid,
            chunk=chunk,
            axis=self.axis,
        )
        return np.asarray(ranks)

    def query(
        self,
        qdescriptors: np.ndarray,
        k: int = 10,
        chunk: int | None = None,
        pre_transformed: bool = False,
    ):
        """Distributed exact top-k. Returns host ``(scores, indices)``."""
        q = (jnp.asarray(qdescriptors, jnp.float32) if pre_transformed
             else self.transform_queries(qdescriptors))
        rep = NamedSharding(self.mesh, P())
        q = _put_global(q, rep)
        k_eff = min(k, self.n_valid)
        scores, idx = sharded_knn(
            self.gallery,
            q,
            k=k_eff,
            mesh=self.mesh,
            n_valid=self.n_valid,
            chunk=chunk,
            axis=self.axis,
        )
        return np.asarray(scores), np.asarray(idx)
