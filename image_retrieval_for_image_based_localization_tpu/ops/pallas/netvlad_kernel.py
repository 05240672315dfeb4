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
padding is masked in-kernel from static shapes.

Bucketed production batches (per-image top-left-rectangle validity) use
``netvlad_fused_rect``: valid (h, w) extents live in SMEM and each chunk
row's validity is two iota compares — mirroring ``gem_l2n_fused_rect`` —
so config 3's soft-assignment kernel covers the masked path too, not just
squarify/uniform buckets. Arbitrary (non-rectangle) masks still delegate
to the XLA oracle via ``netvlad_fused(mask=...)``.

Differentiability: both entry points carry a ``jax.custom_vjp`` whose
backward is the VJP of the jnp oracle (``ops.netvlad.netvlad_aggregate``)
recomputed from saved residuals — identical gradient semantics to
``use_pallas=False`` training, same scheme as ``ops.pallas.gem_l2n``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
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


def _kernel_rect(
    sz_ref, x_ref, w_ref, b_ref, c_ref, out_ref, agg_ref, cnt_ref,
    *, n_chunks: int, chunk: int, W: int,
):
    """Masked variant: per-image validity is the top-left (h, w) rectangle
    (this framework's bucketing invariant); extents live in SMEM and each
    row's validity is two iota compares, as in ``gem_l2n._kernel_rect``."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        agg_ref[...] = jnp.zeros_like(agg_ref)
        cnt_ref[...] = jnp.zeros_like(cnt_ref)

    h = sz_ref[i, 0]
    w = sz_ref[i, 1]
    x = x_ref[0].astype(jnp.float32)             # [chunk, C]
    logits = (
        jnp.dot(x, w_ref[...], preferred_element_type=jnp.float32)
        + b_ref[...]
    )                                            # [chunk, K]
    a = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    a = a / jnp.sum(a, axis=-1, keepdims=True)
    n = j * chunk + jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    valid = ((n // W) < h) & ((n % W) < w)
    a = jnp.where(valid, a, 0.0)

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


def _forward_rect(x, centroids, assign_w, assign_b, sizes, W, chunk, interpret):
    B, N, C = x.shape
    K = centroids.shape[0]

    chunk = min(chunk, max(8, -(-N // 8) * 8))
    chunk = -(-chunk // 8) * 8
    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    sizes = jnp.asarray(sizes, jnp.int32)

    return pl.pallas_call(
        functools.partial(_kernel_rect, n_chunks=n_chunks, chunk=chunk, W=W),
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
    )(sizes, x, assign_w, assign_b.reshape(1, K), centroids)


def _oracle(x, centroids, assign_w, assign_b, mask=None):
    from image_retrieval_for_image_based_localization_tpu.ops.netvlad import (
        netvlad_aggregate,
    )

    return netvlad_aggregate(x, centroids, assign_w, assign_b, mask=mask)


def _rect_mask(sizes: jnp.ndarray, N: int, W: int) -> jnp.ndarray:
    n = jax.lax.broadcasted_iota(jnp.int32, (sizes.shape[0], N), 1)
    return ((n // W) < sizes[:, 0, None]) & ((n % W) < sizes[:, 1, None])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _nv(x, centroids, assign_w, assign_b, chunk, interpret):
    return _netvlad_fused_nomask(x, centroids, assign_w, assign_b, chunk, interpret)


def _nv_fwd(x, centroids, assign_w, assign_b, chunk, interpret):
    out = _netvlad_fused_nomask(x, centroids, assign_w, assign_b, chunk, interpret)
    return out, (x, centroids, assign_w, assign_b)


def _nv_bwd(chunk, interpret, res, g):
    x, centroids, assign_w, assign_b = res
    _, vjp = jax.vjp(_oracle, x, centroids, assign_w, assign_b)
    dx, dc, dw, db = vjp(g)
    return dx.astype(x.dtype), dc, dw, db


_nv.defvjp(_nv_fwd, _nv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _nv_rect(x, centroids, assign_w, assign_b, sizes, W, chunk, interpret):
    return _forward_rect(x, centroids, assign_w, assign_b, sizes, W, chunk, interpret)


def _nv_rect_fwd(x, centroids, assign_w, assign_b, sizes, W, chunk, interpret):
    out = _forward_rect(x, centroids, assign_w, assign_b, sizes, W, chunk, interpret)
    return out, (x, centroids, assign_w, assign_b, sizes)


def _nv_rect_bwd(W, chunk, interpret, res, g):
    x, centroids, assign_w, assign_b, sizes = res
    mask = _rect_mask(sizes, x.shape[1], W)
    _, vjp = jax.vjp(
        lambda xx, cc, ww, bb: _oracle(xx, cc, ww, bb, mask=mask),
        x, centroids, assign_w, assign_b,
    )
    dx, dc, dw, db = vjp(g)
    dsizes = np.zeros(sizes.shape, jax.dtypes.float0)
    return dx.astype(x.dtype), dc, dw, db, dsizes


_nv_rect.defvjp(_nv_rect_fwd, _nv_rect_bwd)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def netvlad_fused_rect(
    x: jnp.ndarray,
    centroids: jnp.ndarray,
    assign_w: jnp.ndarray,
    assign_b: Optional[jnp.ndarray] = None,
    sizes: jnp.ndarray | None = None,
    chunk: int = 1024,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Masked fused NetVLAD for rectangle-valid batches.

    x: [B, H, W, C]; sizes: [B, 2] int32 valid (h, w) per image — the
    top-left-rectangle validity this framework's bucketing guarantees
    (arbitrary masks: use ``netvlad_fused(mask=...)``). Differentiable
    (sizes get a zero cotangent). Returns [B, K*C].
    """
    B, H, W, C = x.shape
    K = centroids.shape[0]
    if assign_b is None:
        assign_b = jnp.zeros((K,), jnp.float32)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _nv_rect(
        x.reshape(B, H * W, C),
        centroids,
        assign_w,
        assign_b,
        jnp.asarray(sizes, jnp.int32),
        W,
        chunk,
        interpret,
    )


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
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

    With ``mask`` (arbitrary spatial validity) the computation delegates to
    the XLA oracle — rectangle-valid bucketed batches should call
    ``netvlad_fused_rect`` (fused, sizes in SMEM) instead.
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
        return _oracle(x, centroids, assign_w, assign_b, mask=mask)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _nv(x, centroids, assign_w, assign_b, chunk, interpret)
