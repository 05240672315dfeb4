"""In-kernel streamed matmul + exact top-k: no HBM score matrix.

The kernel BASELINE.json:5 / SURVEY §8.1 item 3 calls for, round-3 build.
``retrieval.knn.streaming_topk`` (the default exact search) materializes the
[Nq, chunk] score block in HBM and selects with two ``lax.top_k`` calls; on
hardware the TopK custom-call is the single largest device cost of a search
(~2.2 ms of a ~4.2 ms 256-query batch at [256 x 100k x 2048] — PERF.md
round-3 kNN notes). This kernel never writes scores anywhere: gallery chunks
stream HBM->VMEM through the Mosaic pipeline, each [TQ, D] x [D, CH] tile is
scored on the MXU, and an exact running top-128 per query is maintained
*in VMEM* with a bitonic selection network on the VPU:

  per 128-lane block of the fresh score tile:
    1. bitonic-sort the block ASCENDING by (score, -index)   (28 stages)
    2. halver: winners of lane-wise compare of the sorted-DESC running
       top-128 R against the sorted-ASC block B form a bitonic sequence
       holding the exact top-128 of R ∪ B                     (1 stage)
    3. bitonic-merge the winners back to sorted-DESC          (7 stages)

  every stage is two lane-rolls + selects on [TQ, 128] vregs — no
  data-dependent control flow, no scatter, nothing leaves VMEM.

Comparisons use the strict total order (score desc, index asc), so ties
break lower-index-first — exactly NumPy ``argsort(-s, kind='stable')``
semantics over the same score values, matching ``knn.merge_topk``.

Precision: scores are computed like the XLA path computes them (bf16
operand rounding on the MXU with f32 accumulation — jax's DEFAULT matmul
precision on TPU); interpret mode (CPU tests) runs exact f32.

HARDWARE STATUS (round 3, v5e via the axon relay): the selection network is
exact in interpret mode (bitwise vs NumPy stable argsort incl. adversarial
duplicate galleries — tests/test_fused_topk.py) but DOES NOT COMPILE on
this rig's Mosaic: (a) vector selects over bool operands fail ("unsupported
target bitwidth for truncation", worked around with xor/and logic), and
(b) any kernel containing two or more lane-rotates (jnp.roll or pltpu.roll,
any shifts) hangs the TPU compile helper indefinitely — bisected to exactly
the 2-rotate case; a single rotate compiles and runs fine. The bitonic
network needs ~36 rotates per 128-block, so this kernel stays
interpret-mode-only until the toolchain fixes multi-rotate lowering.
The device-side selection cost it targets was instead cut in XLA
(retrieval.knn round-3 notes + PERF.md): the final [Q, k*block] TopK
custom-call dominates device search time, and the iterative-extraction /
block-size tuning measured there is the shipped mitigation.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(np.finfo(np.float32).min)
LANES = 128


def _beats(va, ia, vb, ib):
    """Strict total order: (higher score, then lower index) wins."""
    return (va > vb) | ((va == vb) & (ia < ib))


def _partner(x, d):
    """XOR-partner value along the last (lane) axis at distance d:
    out[l] = x[l ^ d], via two cyclic rolls + select (wrap values are never
    selected because XOR pairs stay within aligned 2d blocks)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    has_bit = (lane & d) != 0
    return jnp.where(has_bit, jnp.roll(x, d, axis=-1), jnp.roll(x, -d, axis=-1))


def _cmp_exchange(v, i, d, want_max):
    """One bitonic compare-exchange stage at distance d.

    want_max: bool array (broadcastable to v.shape) — lanes that keep the
    winner of the (score, index) order; the partner lane keeps the loser.
    """
    pv = _partner(v, d)
    pi = _partner(i, d)
    # Mosaic cannot lower select on bool vectors (i8->i1 truncation), so
    # the branch is pure logical composition: want-max lanes take mine iff
    # mine beats partner; want-min lanes take mine iff it does NOT (for
    # identical (v, i) pairs both reads give the same value either way).
    mine_beats = _beats(v, i, pv, pi)
    take_mine = ~(want_max ^ mine_beats)
    keep = take_mine | ((v == pv) & (i == pi))
    return jnp.where(keep, v, pv), jnp.where(keep, i, pi)


def _lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _sort_block_asc(v, i):
    """Full bitonic sort of each 128-lane row, ASCENDING in the total order
    (worst first). Standard network: build alternating runs, then merge."""
    lane = _lane_iota(v.shape)
    for size in (2, 4, 8, 16, 32, 64, 128):
        # ascending sub-blocks where (lane & size) == 0 (final level: all)
        asc = (lane & size) == 0 if size < LANES else jnp.ones_like(lane, bool)
        d = size // 2
        while d >= 1:
            upper = (lane & d) != 0
            want_max = ~(asc ^ upper)  # asc ? upper : ~upper, select-free
            v, i = _cmp_exchange(v, i, d, want_max)
            d //= 2
    return v, i


def _merge_desc(v, i):
    """Bitonic merge of a bitonic 128-row to sorted DESC (best at lane 0)."""
    lane = _lane_iota(v.shape)
    d = LANES // 2
    while d >= 1:
        want_max = (lane & d) == 0
        v, i = _cmp_exchange(v, i, d, want_max)
        d //= 2
    return v, i


def _kernel(q_ref, g_ref, ov_ref, oi_ref, rv_ref, ri_ref,
            *, n_chunks: int, ch: int, n_valid: int, mxu_bf16: bool):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        rv_ref[...] = jnp.full(rv_ref.shape, NEG_INF, jnp.float32)
        # distinct pad indices keep the (score, index) order strict
        ri_ref[...] = (
            jnp.iinfo(jnp.int32).max - LANES
            + _lane_iota(ri_ref.shape)
        )

    q = q_ref[...]
    g = g_ref[...]
    if mxu_bf16:
        q = q.astype(jnp.bfloat16)
        g = g.astype(jnp.bfloat16)
    s = jax.lax.dot_general(
        q, g, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TQ, CH]
    col = j * ch + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_valid, s, NEG_INF)

    rv, ri = rv_ref[...], ri_ref[...]
    for b in range(ch // LANES):
        bv = s[:, b * LANES:(b + 1) * LANES]
        bi = col[:, b * LANES:(b + 1) * LANES]
        bv, bi = _sort_block_asc(bv, bi)
        # halver: R sorted desc ++ B sorted asc is bitonic; lane-wise winners
        # are the exact top-128 of R ∪ B, as a bitonic sequence
        take_r = _beats(rv, ri, bv, bi)
        wv = jnp.where(take_r, rv, bv)
        wi = jnp.where(take_r, ri, bi)
        rv, ri = _merge_desc(wv, wi)
    rv_ref[...], ri_ref[...] = rv, ri

    @pl.when(j == n_chunks - 1)
    def _():
        ov_ref[...] = rv
        oi_ref[...] = ri


@functools.partial(jax.jit, static_argnames=("k", "tq", "ch", "interpret"))
def fused_topk_search(
    gallery: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    tq: int = 256,
    ch: int = 512,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k search, scores never materialized. Drop-in for
    ``knn.knn_search`` when ``k <= 128``.

    gallery: [Ng, D] f32 or bf16 (bf16 halves both stream traffic and MXU
    passes; scores still accumulate f32). queries: [Nq, D].
    Returns (scores [Nq, k] f32, indices [Nq, k] int32), ties lower-index
    first.
    """
    if k > LANES:
        raise ValueError(f"fused_topk_search supports k <= {LANES}, got {k}")
    if ch % LANES:
        raise ValueError(
            f"ch must be a multiple of {LANES} (the selection network is "
            f"per-128-lane-block; a remainder would be silently dropped), got {ch}"
        )
    Ng, D = gallery.shape
    k = min(k, Ng)  # same clamp as knn.knn_search: never return pad sentinels
    Nq = queries.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    mxu_bf16 = not interpret  # match XLA's DEFAULT matmul precision on TPU
    if gallery.dtype == jnp.bfloat16:
        queries = queries.astype(jnp.bfloat16)

    tq = min(tq, -(-Nq // 8) * 8)
    pad_q = (-Nq) % tq
    if pad_q:
        queries = jnp.pad(queries, ((0, pad_q), (0, 0)))
    pad_g = (-Ng) % ch
    if pad_g:
        gallery = jnp.pad(gallery, ((0, pad_g), (0, 0)))
    NQP, NGP = queries.shape[0], gallery.shape[0]
    n_chunks = NGP // ch

    ov, oi = pl.pallas_call(
        functools.partial(
            _kernel, n_chunks=n_chunks, ch=ch, n_valid=Ng, mxu_bf16=mxu_bf16
        ),
        grid=(NQP // tq, n_chunks),
        in_specs=[
            pl.BlockSpec((tq, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tq, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NQP, LANES), jnp.float32),
            jax.ShapeDtypeStruct((NQP, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tq, LANES), jnp.float32),
            pltpu.VMEM((tq, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(queries, gallery)
    return ov[:Nq, :k], oi[:Nq, :k]
