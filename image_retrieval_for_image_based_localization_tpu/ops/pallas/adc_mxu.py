"""MXU one-hot ADC scoring — PQ asymmetric distances as a Pallas matmul.

The gather-based ADC pass (``retrieval.pq._adc_block``) reduces
``score[q, row] = sum_m LUT[q, m, code[row, m]]`` with a vectorized
take-along-axis.  On TPU that gather runs on the VPU at a few lanes per
cycle and is the whole search cost: at the bench operating point
(N=100k, D=2048, M=64, nq=256) the full gather search measures
~1.6k q/s on this rig while the dense f32 matmul over the SAME data
volume would be >20x faster — the TPU has no fast per-lane gather, but
it has an MXU.

This kernel recasts the LUT lookup as a matmul the MXU can eat:

* flatten the LUT to ``T = [K, nq]``, ``K = M*256`` (subquantizer-major:
  row ``m*256 + v`` holds ``LUT[:, m, v]``);
* per 512-row code block, build the one-hot matrix ``OH[row, m*256 +
  code[row, m]] = 1`` as ``M`` lane-dim compares against a [512, 256]
  iota, concatenated to ``[512, K]`` bf16 (one-hot is EXACT in bf16);
* ``OH @ T`` on the MXU gives the block's scores ``[512, nq]`` with f32
  accumulation — the gather has become a structured matmul.

Precision: the table must be bf16 for MXU rate, so ``T`` is split
``hi = bf16(T)``, ``lo = bf16(T - hi)`` and both products accumulate in
f32 (``dual=True``).  Because one-hot entries are exact, the result is
the bf16x2 representation of the true f32 LUT entry — measured
max|err| 5.6e-4 ABS on scores of magnitude ~2e2 (rel ~3e-6) at the
bench point, with 100.00% top-100 shortlist overlap vs the f32 gather.
``dual=False`` (single bf16 dot, rel ~2e-3) is ~8% faster and keeps
99.7% overlap; the default is the near-exact dual pass.

Hardware verdict (v5e rig, N=100k/D=2048/M=64/nq=256, k=100, median of
7): standalone experiment — gather search 159.8 ms (1,602 q/s) -> MXU
dual 60.1 ms (4,258 q/s), MXU single 55.5 ms (4,615 q/s), 2.7x.
Production ``_adc_search`` (jit, LUT build + streaming top-k included,
codes widened to i32 pre-scan): gather 127.5 ms (2,008 q/s) -> MXU dual
67.1 ms (3,814 q/s), **1.9x end-to-end**, 100.0% top-100 overlap.
The kernel is
one-hot-BUILD bound (VPU compares over [512, K] dominate; the dot adds
~10%), which is why the dual pass costs only ~8% more and why small
``nq`` does not shrink the cost: the one-hot build is nq-independent.
For tiny query batches the gather path stays the right default
(``recommend_backend``).

Layout notes (what Mosaic accepts, discovered by measurement):
* one-hot must be built with the 256-wide compare on the LANE dim and
  concatenated along lanes to [512, K] — the transposed build ([K, blk]
  sublane-major, which would let the kernel emit [nq, blk] directly)
  fails to compile;
* consequently scores leave the kernel as ``[blk, nq]`` and the
  consumer transposes — XLA fuses that into the downstream top-k mask;
* the kernel accepts uint8 or i32 codes (cast in-kernel), but a caller
  that dynamic-slices code blocks inside a ``lax.scan`` (the streaming
  top-k in ``retrieval/pq.py``) must widen to i32 FIRST: slicing uint8
  out of a scanned operand triggers an (8,128)->(32,128) tile repack
  that costs +33 ms at the bench point — measured 98.7 ms uint8 vs
  66.4 ms i32 end-to-end.  4x the code-read bytes is the cheaper side
  of that trade everywhere we measured.

Reference anchor: the reference has no PQ (SURVEY.md §2 lists FAISS as
N/A — it brute-forces f32); this kernel serves the beyond-reference
compressed-gallery search (``retrieval/pq.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 512 gallery rows per grid step: oh [512, K] bf16 = 16 MB VMEM at M=64 —
# the sweet spot measured on hardware (256 is ~15% slower, 1024 gains <2%).
BLOCK_ROWS = 512
_V = 256  # uint8 codebook size; fixed by the code dtype

# hi+lo tables at nq_pad > 512 would need >64 MB VMEM (K=16384) — past
# this the caller must query-chunk or fall back to the gather path.
MAX_NQ_PAD = 512


def _adc_kernel(m: int, dual: bool, blk: int):
    def kernel(codes_ref, hi_ref, lo_ref, out_ref):
        c = codes_ref[:].astype(jnp.int32)                     # [blk, M]
        iota_v = jax.lax.broadcasted_iota(jnp.int32, (blk, _V), 1)
        oh = jnp.concatenate(
            [(c[:, mm][:, None] == iota_v).astype(jnp.bfloat16)
             for mm in range(m)],
            axis=1,
        )                                                      # [blk, K]
        acc = jnp.dot(oh, hi_ref[:], preferred_element_type=jnp.float32)
        if dual:
            acc = acc + jnp.dot(oh, lo_ref[:],
                                preferred_element_type=jnp.float32)
        out_ref[:] = acc
    return kernel


def prepare_lut_tables(lut: jnp.ndarray):
    """Flatten+split an ADC LUT for the MXU kernel.

    ``lut`` [nq, M, 256] f32 -> ``(hi, lo)`` each [K, nq_pad] bf16 with
    ``K = M*256`` subquantizer-major rows and ``nq`` padded up to a
    multiple of 128 lanes.  Call once per query batch; the tables are
    broadcast to every code block.
    """
    nq, m, v = lut.shape
    assert v == _V, f"ADC MXU kernel requires 256-entry codebooks, got {v}"
    nq_pad = max(128, -(-nq // 128) * 128)
    t = lut.transpose(1, 2, 0).reshape(m * v, nq)              # [K, nq]
    if nq_pad != nq:
        t = jnp.pad(t, ((0, 0), (0, nq_pad - nq)))
    hi = t.astype(jnp.bfloat16)
    # TRAP: under jit, XLA's excess-precision pass treats f32->bf16->f32
    # as identity, which folds ``t - f32(bf16(t))`` to zero and silently
    # degrades the dual pass to single-bf16 (caught on hardware: the
    # shortlist match rate dropped to the bf16 signature).  The barrier
    # pins the rounded hi as a real value.
    hi = jax.lax.optimization_barrier(hi)
    lo = (t - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def adc_scores_mxu(
    codes: jnp.ndarray,   # [n, M] uint8, n % block_rows == 0
    hi: jnp.ndarray,      # [K, nq_pad] bf16 (prepare_lut_tables)
    lo: jnp.ndarray,
    *,
    dual: bool = True,
    block_rows: int = BLOCK_ROWS,
    interpret: bool = False,
) -> jnp.ndarray:
    """ADC scores for a code chunk: ``[n, nq_pad]`` f32 (NOTE: row-major —
    gallery rows on the SUBLANE axis; the consumer transposes)."""
    n, m = codes.shape
    k_dim, nq_pad = hi.shape
    assert n % block_rows == 0, (n, block_rows)
    assert k_dim == m * _V
    return pl.pallas_call(
        _adc_kernel(m, dual, block_rows),
        grid=(n // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, m), lambda i: (i, 0)),
            pl.BlockSpec((k_dim, nq_pad), lambda i: (0, 0)),
            pl.BlockSpec((k_dim, nq_pad), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, nq_pad), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, nq_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(codes, hi, lo)


def recommend_backend(nq: int, n: int, m: int) -> str:
    """'mxu' when the one-hot matmul wins, else 'gather'.

    The one-hot build costs O(n*K) VPU work regardless of nq, so tiny
    query batches can't amortize it — the gather pass (O(n*M*nq)) wins
    below ~nq=32.  Above MAX_NQ_PAD the tables exceed the VMEM budget.
    Only meaningful on TPU; callers gate on the platform.
    """
    nq_pad = max(128, -(-nq // 128) * 128)
    if nq < 32 or nq_pad > MAX_NQ_PAD:
        return "gather"
    if n < 4 * BLOCK_ROWS:              # sub-4-block galleries: not worth it
        return "gather"
    return "mxu"
