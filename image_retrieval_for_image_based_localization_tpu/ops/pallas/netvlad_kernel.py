"""Fused NetVLAD soft-assignment + residual aggregation Pallas kernel.

The "soft-assignment kernel" BASELINE.json:9 calls for (SURVEY.md §2.1):
replaces the reference's ATen softmax + matmul sequence with one pass that
keeps the assignment matrix entirely in VMEM — it is never materialized in
HBM (at N=4096, K=64 that saves a 1M-float round trip per image).

Per (image, spatial-chunk) grid step, on-chip:
  logits = x @ W + b  (MXU) → row softmax (VPU) →
  agg += softmaxᵀ @ x (MXU), counts += Σ softmax
and on the final chunk the VLAD residual ``agg - counts ⊙ centroids`` is
intra-normalized per cluster, flattened, and globally L2-normalized —
matching ``ops.netvlad.netvlad_aggregate`` (the tested oracle) exactly.

TPU lowering notes (learned on hardware): the output block is the full
[B, K*C] array (row blocks violate tile divisibility for B % 8 != 0); chunk
padding is masked in-kernel from static shapes. A spatial validity ``mask``
(ragged buckets) can't be block-mapped efficiently — that path delegates to
the XLA oracle, which fuses well; the fused kernel is the full-valid
fast path (squarify/uniform buckets, the throughput configuration).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-6


def _kernel(
    x_ref, w_ref, b_ref, c_ref, out_ref, agg_ref, cnt_ref,
    *, n_chunks: int, n_total: int, chunk: int,
):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        agg_ref[...] = jnp.zeros_like(agg_ref)
        cnt_ref[...] = jnp.zeros_like(cnt_ref)

    x = x_ref[0].astype(jnp.float32)             # [chunk, C]
    logits = (
        jnp.dot(x, w_ref[...], preferred_element_type=jnp.float32)
        + b_ref[...]
    )                                            # [chunk, K]
    a = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    a = a / jnp.sum(a, axis=-1, keepdims=True)
    # static tail masking: padded rows get zero assignment
    row = j * chunk + jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    a = jnp.where(row < n_total, a, 0.0)

    agg_ref[...] += jax.lax.dot_general(
        a, x, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                            # [K, C]
    cnt_ref[...] += jnp.sum(a, axis=0, keepdims=True)  # [1, K]

    @pl.when(j == n_chunks - 1)
    def _():
        K, C = agg_ref.shape
        vlad = agg_ref[...] - cnt_ref[...].reshape(K, 1) * c_ref[...]
        intra = jnp.sqrt(jnp.sum(vlad * vlad, axis=-1, keepdims=True))
        vlad = vlad / (intra + EPS)
        flat = vlad.reshape(1, K * C)
        gnorm = jnp.sqrt(jnp.sum(flat * flat))
        out_ref[i, :] = (flat / (gnorm + EPS))[0]


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def _netvlad_fused_nomask(x, centroids, assign_w, assign_b, chunk, interpret):
    B, N, C = x.shape
    K = centroids.shape[0]

    chunk = min(chunk, max(8, -(-N // 8) * 8))
    chunk = -(-chunk // 8) * 8
    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))

    return pl.pallas_call(
        functools.partial(_kernel, n_chunks=n_chunks, n_total=N, chunk=chunk),
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, chunk, C), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, K), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, K * C), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K * C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((K, C), jnp.float32),
            pltpu.VMEM((1, K), jnp.float32),
        ],
        interpret=interpret,
    )(x, assign_w, assign_b.reshape(1, K), centroids)


def netvlad_fused(
    x: jnp.ndarray,
    centroids: jnp.ndarray,
    assign_w: jnp.ndarray,
    assign_b: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    chunk: int = 1024,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused NetVLAD aggregation. x: [B, N, C] (or [B,H,W,C]) -> [B, K*C].

    With ``mask`` (ragged spatial validity) the computation delegates to the
    XLA oracle — see module docstring.
    """
    if x.ndim == 4:
        B, H, W, C = x.shape
        x = x.reshape(B, H * W, C)
        if mask is not None:
            mask = mask.reshape(B, H * W)
    K = centroids.shape[0]
    if assign_b is None:
        assign_b = jnp.zeros((K,), jnp.float32)
    if mask is not None:
        from image_retrieval_for_image_based_localization_tpu.ops.netvlad import (
            netvlad_aggregate,
        )

        return netvlad_aggregate(x, centroids, assign_w, assign_b, mask=mask)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _netvlad_fused_nomask(x, centroids, assign_w, assign_b, chunk, interpret)
