"""Multi-chip PQ: ADC search over a row-sharded code matrix.

``retrieval.pq`` compresses gallery rows to ``M`` uint8 codes (~128x);
this module shards those codes over the mesh's ``gallery`` axis the same
way ``parallel.sharded_index`` shards f32 rows — at 128x compression a
single v5e chip already holds ~1B codes, so the point here is less HBM
capacity than keeping the WHOLE serving fleet's search path uniform: the
same mesh, the same (score desc, row asc) tie contract, the same tiny
ICI merge. The reference has no analog (single-GPU brute force,
SURVEY.md §2.2).

Search (one ``shard_map``-ed program):
  1. every chip builds the same ``[nq, M, 256]`` LUTs (one replicated MXU
     einsum — queries and codebooks are tiny and replicated);
  2. each chip streams ITS code shard through ``pq.adc_topk_core`` with
     global row bookkeeping (offset = shard_id * local_rows);
  3. per-chip (k score, k global-row) partials — k*8 bytes/query/chip —
     all-gather over ICI and a final ``merge_topk`` selects the global
     top-k, bitwise-identical to single-device ADC.

Refinement stays host-assisted: the top-R global rows come back tiny
([nq, R] int32), the f32 rows are gathered from the HOST gallery (which
PQ exists to keep out of HBM) and rescored on the default device via
``pq.rescore_rows`` — exact scores, ~R/N of the gallery touched.
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

from image_retrieval_for_image_based_localization_tpu.retrieval.knn import (
    merge_topk,
)
from image_retrieval_for_image_based_localization_tpu.retrieval.pq import (
    PQIndex,
    _build_luts,
    adc_topk_core,
    rescore_rows,
)


@functools.partial(
    jax.jit, static_argnames=("k", "chunk", "n_valid", "mesh", "axis")
)
def sharded_adc_topk(
    codes: jax.Array,      # [N_padded, M] uint8, P(axis, None)
    codebooks: jax.Array,  # [M, 256, ds] f32, replicated
    queries: jax.Array,    # [nq, D] f32, replicated
    k: int,
    mesh: Mesh,
    n_valid: int,
    chunk: int,
    axis: str = "gallery",
) -> Tuple[jax.Array, jax.Array]:
    """Distributed ADC top-k over row-sharded PQ codes.

    Returns replicated ``(scores [nq, k], global rows [nq, k])`` equal to
    single-device ``PQIndex.search`` bitwise (pad rows masked to -inf).
    """
    n_shards = mesh.shape[axis]
    local_rows = codes.shape[0] // n_shards

    def local_fn(codes_l, books, q):
        shard_id = jax.lax.axis_index(axis)
        offset = shard_id * local_rows
        local_valid = jnp.clip(n_valid - offset, 0, local_rows)
        lut = _build_luts(books, q)
        # the core clamps k/chunk to the shard's row count; the gathered
        # width shards*min(k, local_rows) always covers k (k <= n_valid)
        s, i = adc_topk_core(
            lut, codes_l, k=k, chunk=chunk,
            n_valid=local_valid, index_offset=offset,
        )
        s_all = jax.lax.all_gather(s, axis, axis=1, tiled=True)
        i_all = jax.lax.all_gather(i, axis, axis=1, tiled=True)
        return merge_topk(s_all, i_all, k)

    # check_vma=False for the same reason as sharded_knn: the scan carry
    # is gallery-varying but the merged output provably replicated.
    return jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis, None), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )(codes, codebooks, queries)


class ShardedPQ:
    """PQ codes sharded across the mesh's ``gallery`` axis, HBM-resident.

    Queries are expected already transformed into the index search space
    (same contract as ``ShardedIVF``/``IVFPQIndex``)."""

    def __init__(self, pq: PQIndex, mesh: Optional[Mesh] = None,
                 axis: str = "gallery"):
        from image_retrieval_for_image_based_localization_tpu.parallel.mesh import (
            default_mesh,
        )

        self.mesh = mesh if mesh is not None else default_mesh()
        self.axis = axis
        self.n = pq.n
        self.rotation = pq.rotation  # OPQ: rotate queries host-side
        self.codebooks_np = pq.codebooks
        codes = pq.codes
        n_shards = self.mesh.shape[axis]
        pad = (-codes.shape[0]) % n_shards
        if pad:
            codes = np.concatenate(
                [codes, np.zeros((pad, codes.shape[1]), codes.dtype)])
        # _put_global, not device_put: multi-process pods can't device_put
        # to other hosts' devices (ShardedIndex's contract)
        self.codes = _put_global(
            codes, NamedSharding(self.mesh, P(axis, None)))
        rep = NamedSharding(self.mesh, P())
        self.codebooks = _put_global(pq.codebooks, rep)
        self._rep = rep

    def search(
        self,
        queries: np.ndarray,
        k: int = 10,
        chunk: int = 65536,
        refine: int = 0,
        gallery: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Distributed ADC top-k; ``refine=R`` exact-rescoring of the
        top-R rows against the HOST f32 ``gallery`` (see module doc)."""
        q = np.atleast_2d(np.asarray(queries, np.float32))
        qr = q if self.rotation is None else q @ self.rotation
        qj = _put_global(qr, self._rep)
        k_eff = min(k, self.n)
        k_stage = min(max(refine, k_eff) if refine else k_eff, self.n)
        s, i = sharded_adc_topk(
            self.codes, self.codebooks, qj, k=k_stage, mesh=self.mesh,
            n_valid=self.n, chunk=chunk, axis=self.axis,
        )
        if refine:
            if gallery is None:
                raise ValueError("refine requires the host f32 gallery")
            gallery = np.asarray(gallery)
            cand = np.sort(np.asarray(i), axis=1)
            sub = gallery[np.clip(cand, 0, self.n - 1)]      # [nq, R, D]
            s, i = rescore_rows(
                jnp.asarray(sub), jnp.asarray(q), jnp.asarray(cand),
                self.n, k=k_eff,
            )
        return np.asarray(s), np.asarray(i)
