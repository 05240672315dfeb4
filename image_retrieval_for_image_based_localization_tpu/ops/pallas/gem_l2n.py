"""Fused GeM pooling + L2 normalization Pallas kernel.

Replaces the reference's ATen reduction + separate normalize
(`layers/pooling.py` + `layers/normalization.py`, SURVEY.md §2.1: the
"fused clamp→pow(p)→mean→pow(1/p)→L2N" kernel BASELINE.json:5 calls for).

One pass over the feature map in VMEM-sized chunks: the HBM traffic is
exactly one read of the [B, H*W, C] features and one write of [B, C]
descriptors — the elementwise chain and both reductions never round-trip to
HBM. Grid is (B, spatial-chunks); a VMEM scratch carries the running sum of
clamp(x, eps)^p; the final chunk applies mean, pow(1/p), and the L2
normalization.

TPU lowering notes (learned on hardware, not interpret mode):
  * the output block is the full [B, C] array (a [1, C] row block violates
    the (8, 128) tile-divisibility rule when B % 8 != 0) — each grid step
    writes only its row;
  * spatial padding to a chunk multiple is masked *inside* the kernel from
    static shapes (program_id vs. true N), so no mask input is needed.

Differentiability: both entry points carry a ``jax.custom_vjp``. The
backward pass is the VJP of the pure-jnp oracle (``ops.pooling.gem`` ∘
``ops.normalization.l2n`` semantics, identical eps/clamp/order), recomputed
from the saved features — gradients therefore match the XLA head exactly by
construction, while inference keeps the fused single-HBM-pass forward. The
GeM+L2N tail is O(N·C) elementwise work, negligible next to the trunk's
conv FLOPs, so the recompute costs ~nothing in training.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GEM_EPS = 1e-6
L2N_EPS = 1e-6


def _kernel(p_ref, x_ref, out_ref, acc_ref, *, n_chunks: int, n_total: int, chunk: int):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p = p_ref[0]
    x = x_ref[0].astype(jnp.float32)            # [chunk, C]
    xp = jnp.power(jnp.clip(x, min=GEM_EPS), p)
    # static tail masking: rows past the true spatial size contribute 0
    row = j * chunk + jax.lax.broadcasted_iota(jnp.int32, xp.shape, 0)
    xp = jnp.where(row < n_total, xp, 0.0)
    acc_ref[...] += jnp.sum(xp, axis=0, keepdims=True)  # [1, C]

    @pl.when(j == n_chunks - 1)
    def _():
        pooled = jnp.power(acc_ref[0] / n_total, 1.0 / p)  # [C]
        norm = jnp.sqrt(jnp.sum(pooled * pooled))
        out_ref[i, :] = pooled / (norm + L2N_EPS)


def _kernel_rect(
    p_ref, sz_ref, x_ref, out_ref, acc_ref, *, n_chunks: int, chunk: int, W: int
):
    """Masked variant: per-image valid region is the top-left (h, w)
    rectangle (the invariant of this framework's bucketed batches); extents
    live in SMEM and the validity test is two iota compares per element."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p = p_ref[0]
    h = sz_ref[i, 0]
    w = sz_ref[i, 1]
    x = x_ref[0].astype(jnp.float32)            # [chunk, C]
    n = j * chunk + jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    valid = ((n // W) < h) & ((n % W) < w)
    xp = jnp.where(valid, jnp.power(jnp.clip(x, min=GEM_EPS), p), 0.0)
    acc_ref[...] += jnp.sum(xp, axis=0, keepdims=True)

    @pl.when(j == n_chunks - 1)
    def _():
        denom = jnp.maximum(h * w, 1).astype(jnp.float32)
        pooled = jnp.power(acc_ref[0] / denom, 1.0 / p)
        norm = jnp.sqrt(jnp.sum(pooled * pooled))
        out_ref[i, :] = pooled / (norm + L2N_EPS)


def _pad_chunks(feats: jnp.ndarray, chunk: int):
    """Pad [B, N, C] spatially to a sublane-aligned chunk multiple."""
    B, N, C = feats.shape
    chunk = min(chunk, max(8, -(-N // 8) * 8))
    chunk = -(-chunk // 8) * 8  # sublane-aligned
    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    if pad:
        feats = jnp.pad(feats, ((0, 0), (0, pad), (0, 0)))
    return feats, chunk, n_chunks


def _forward(feats: jnp.ndarray, p: jnp.ndarray, chunk: int, interpret: bool):
    """Raw pallas forward. feats: [B, N, C] unpadded."""
    B, N, C = feats.shape
    feats, chunk, n_chunks = _pad_chunks(feats, chunk)
    p_arr = jnp.asarray(p, jnp.float32).reshape(1)
    return pl.pallas_call(
        functools.partial(_kernel, n_chunks=n_chunks, n_total=N, chunk=chunk),
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, chunk, C), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((B, C), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, C), jnp.float32)],
        interpret=interpret,
    )(p_arr, feats)


def _forward_rect(
    feats: jnp.ndarray, p: jnp.ndarray, sizes: jnp.ndarray,
    W: int, chunk: int, interpret: bool,
):
    """Raw pallas masked forward. feats: [B, N=H*W, C] unpadded."""
    B, N, C = feats.shape
    feats, chunk, n_chunks = _pad_chunks(feats, chunk)
    p_arr = jnp.asarray(p, jnp.float32).reshape(1)
    sizes = jnp.asarray(sizes, jnp.int32)
    return pl.pallas_call(
        functools.partial(_kernel_rect, n_chunks=n_chunks, chunk=chunk, W=W),
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, chunk, C), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((B, C), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, C), jnp.float32)],
        interpret=interpret,
    )(p_arr, sizes, feats)


def _oracle(x: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Pure-jnp reference of the fused op (same eps/clamp/order as the
    kernel and the XLA head): l2n((mean(clamp(x, eps)^p))^(1/p))."""
    xp = jnp.power(jnp.clip(x.astype(jnp.float32), min=GEM_EPS), p)
    pooled = jnp.power(jnp.mean(xp, axis=1), 1.0 / p)
    norm = jnp.sqrt(jnp.sum(jnp.square(pooled), axis=-1, keepdims=True))
    return pooled / (norm + L2N_EPS)


def _oracle_rect(x: jnp.ndarray, p: jnp.ndarray, sizes: jnp.ndarray, W: int):
    B, N, C = x.shape
    n = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
    valid = ((n // W) < sizes[:, 0, None]) & ((n % W) < sizes[:, 1, None])
    xp = jnp.power(jnp.clip(x.astype(jnp.float32), min=GEM_EPS), p)
    xp = jnp.where(valid[..., None], xp, 0.0)
    denom = jnp.maximum(sizes[:, 0] * sizes[:, 1], 1).astype(jnp.float32)
    pooled = jnp.power(jnp.sum(xp, axis=1) / denom[:, None], 1.0 / p)
    norm = jnp.sqrt(jnp.sum(jnp.square(pooled), axis=-1, keepdims=True))
    return pooled / (norm + L2N_EPS)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _gem_l2n(feats3, p, chunk, interpret):
    return _forward(feats3, p, chunk, interpret)


def _gem_l2n_fwd(feats3, p, chunk, interpret):
    return _forward(feats3, p, chunk, interpret), (feats3, p)


def _gem_l2n_bwd(chunk, interpret, res, g):
    feats3, p = res
    _, vjp = jax.vjp(_oracle, feats3, p)
    df, dp = vjp(g)
    return df.astype(feats3.dtype), dp


_gem_l2n.defvjp(_gem_l2n_fwd, _gem_l2n_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _gem_l2n_rect(feats3, p, sizes, W, chunk, interpret):
    return _forward_rect(feats3, p, sizes, W, chunk, interpret)


def _gem_l2n_rect_fwd(feats3, p, sizes, W, chunk, interpret):
    return _forward_rect(feats3, p, sizes, W, chunk, interpret), (feats3, p, sizes)


def _gem_l2n_rect_bwd(W, chunk, interpret, res, g):
    feats3, p, sizes = res
    _, vjp = jax.vjp(lambda x, pp: _oracle_rect(x, pp, sizes, W), feats3, p)
    df, dp = vjp(g)
    # integer-dtype primal -> float0 cotangent
    dsizes = np.zeros(sizes.shape, jax.dtypes.float0)
    return df.astype(feats3.dtype), dp, dsizes


_gem_l2n_rect.defvjp(_gem_l2n_rect_fwd, _gem_l2n_rect_bwd)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def gem_l2n_fused(
    feats: jnp.ndarray,
    p: jnp.ndarray | float,
    chunk: int = 512,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused ``l2n(gem(feats, p))``. feats: [B, H, W, C] or [B, N, C] -> [B, C].

    Differentiable: backward is the exact VJP of the jnp oracle (matches
    training with ``use_pallas=False`` bit-for-bit in gradient semantics).
    """
    if feats.ndim == 4:
        B, H, W, C = feats.shape
        feats = feats.reshape(B, H * W, C)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _gem_l2n(feats, jnp.asarray(p, jnp.float32), chunk, interpret)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def gem_l2n_fused_rect(
    feats: jnp.ndarray,
    p: jnp.ndarray | float,
    sizes: jnp.ndarray,
    chunk: int = 512,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Masked fused ``l2n(gem(feats, p, mask))`` for rectangle-valid batches.

    feats: [B, H, W, C]; sizes: [B, 2] int32 valid (h, w) per image — the
    top-left-rectangle validity this framework's bucketing guarantees
    (arbitrary masks must use the XLA oracle ``ops.pooling.gem``).
    Differentiable like ``gem_l2n_fused`` (sizes get a zero cotangent).
    """
    B, H, W, C = feats.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _gem_l2n_rect(
        feats.reshape(B, H * W, C),
        jnp.asarray(p, jnp.float32),
        jnp.asarray(sizes, jnp.int32),
        W,
        chunk,
        interpret,
    )
