"""VMEM-resident fused ResNet bottleneck block (inference).

Why this kernel exists (PERF.md "Trace decomposition"): at 1024px inputs the
trunk's early stages are HBM-traffic-bound — a single layer1 bottleneck
block moves ~17 GB per b128 batch through HBM (block input 4.3 GB read for
cb1, 64-ch intermediates 2×1.07 GB each way, skip re-read 4.3 GB, output
4.3 GB write) because XLA materializes every conv output. This kernel runs
the whole stride-1 identity-skip bottleneck —

    relu(bn3(conv1x1(relu(bn2(conv3x3(relu(bn1(conv1x1(x)))))))) + x)

— per VMEM-resident spatial tile: the block input is DMA'd from HBM once
(with a 1-pixel halo for the 3×3), the 64/128-ch intermediates never leave
VMEM, and only the final output is written back. Traffic per block drops to
one read + one write of the fat [B,H,W,4C] tensor: ~2× less than XLA's
schedule, on ops measured running at the rig's streaming ceiling.

Design notes:
  * BatchNorm (inference) is folded into the conv weights on the host —
    exact linear algebra: ``W' = W * g/sqrt(v+eps)``, ``b' = b - m*g/sqrt(
    v+eps)`` — so the kernel sees three dense contractions plus bias/ReLU.
  * The 3×3 conv is nine shifted [th*tw, Cm] @ [Cm, Cm] MXU dots over the
    halo'd tile (stride 1, SAME padding via zero halo).
  * Halo loading: the input stays in HBM (`memory_space=ANY`); each grid
    step zero-fills a VMEM scratch and DMAs the valid (clamped) sub-window
    — border tiles get genuine zero padding, matching XLA's conv semantics.
    Tiles are addressed by a static 3-case split per axis (first/interior/
    last) so every DMA has a static shape.
  * f32 accumulation on the MXU (`preferred_element_type`), bf16 residents.
  * Inference-only: no VJP (training uses the XLA path; the backward would
    re-materialize everything this kernel avoids storing).

Used by ``models.fused_trunk.trunk_apply_fused`` for blocks with stride 1
and no downsample branch (all blocks except each stage's first).

STATUS (measured, PERF.md "Fused bottleneck kernel"): numerically correct
on hardware but END-TO-END SLOWER than XLA's small-channel conv emitters
on this rig (330 vs 480 img/s at b128/1024px) — kept opt-in
(``ExtractConfig(fuse_blocks=True)``). Known follow-ups if revisited:
  * cb2 as a single [th*tw, 9*Cm] @ [9*Cm, Cm] dot (im2col patches built
    by nine VMEM copies) — K=576 fills the MXU's contraction dim instead
    of nine K=64 dots at half utilization;
  * pad Cm 64 -> 128 so VPU ops use full lanes;
  * overlap the halo-strip DMAs with compute (start strips for step s+1 at
    step s) instead of start/wait inline;
  * fold the ReLU ring-zeroing into the cb1 dot's output mask.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn(
    kernel: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    mean: jnp.ndarray,
    var: jnp.ndarray,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold inference BatchNorm into the preceding conv (exact, f32).

    Returns ``(W_folded, b_folded)`` with ``conv(x, W)⋅a + b == conv(x,
    W_folded) + b_folded`` where ``a = g/sqrt(v+eps)``.
    """
    a = (scale / jnp.sqrt(var + eps)).astype(jnp.float32)
    w = kernel.astype(jnp.float32) * a  # broadcast over trailing out-ch dim
    b = (bias - mean * a).astype(jnp.float32)
    return w, b


def _kernel(
    x_blk, x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, out_ref,
    x_scr, sem,
    *, th: int, tw: int, nh: int, nw: int, H: int, W: int,
):
    i = pl.program_id(1)
    j = pl.program_id(2)
    b = pl.program_id(0)

    Cin = x_scr.shape[2]
    Cm = w1_ref.shape[1]

    # -- tile assembly. The bulk (th x tw center) arrives as a regular
    # blocked VMEM input — Mosaic double-buffers it against compute — and
    # only the thin halo strips (~12% of the bytes) are DMA'd manually from
    # HBM. Mosaic requires HBM slices on the sublane (W) dim to be
    # 8-aligned, so the W halo is an aligned 8-column strip. Layout
    # invariant: image (row i*th, col j*tw) = scratch (1, 8); the 3x3 taps
    # read rows 0..th+1 and cols 7..tw+8.
    x_scr[...] = jnp.zeros(x_scr.shape, x_scr.dtype)
    x_scr[1 : 1 + th, 8 : 8 + tw, :] = x_blk[0]

    def strip(src_h, rows, dst_h, src_w, cols, dst_w):
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(src_h, rows), pl.ds(src_w, cols), :],
            x_scr.at[pl.ds(dst_h, rows), pl.ds(dst_w, cols), :],
            sem,
        )
        cp.start()
        cp.wait()

    # horizontal (top/bottom) strips span the W halo too, covering corners
    wspan = (
        [(0, tw if nw == 1 else tw + 8, 8, j == 0)] if nw == 1 else [
            (0, tw + 8, 8, j == 0),
            (pl.multiple_of(j * tw - 8, 8), tw + 16, 0, (j > 0) & (j < nw - 1)),
            (pl.multiple_of(j * tw - 8, 8), tw + 8, 0, j == nw - 1),
        ]
    )
    for src_w, cols, dst_w, wcond in wspan:
        @pl.when(wcond & (i > 0))
        def _(src_w=src_w, cols=cols, dst_w=dst_w):
            strip(i * th - 1, 1, 0, src_w, cols, dst_w)

        @pl.when(wcond & (i < nh - 1))
        def _(src_w=src_w, cols=cols, dst_w=dst_w):
            strip(i * th + th, 1, th + 1, src_w, cols, dst_w)

    @pl.when(j > 0)
    def _():
        strip(i * th, th, 1, pl.multiple_of(j * tw - 8, 8), 8, 0)

    @pl.when(j < nw - 1)
    def _():
        strip(i * th, th, 1, pl.multiple_of(j * tw + tw, 8), 8, tw + 8)

    xt = x_scr[...]                                 # [th+2, tw+16, Cin]

    # -- cb1: 1x1 Cin -> Cm over the halo'd tile ---------------------------
    y1 = jax.lax.dot_general(
        xt.reshape((th + 2) * (tw + 16), Cin), w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...]
    y1 = jnp.maximum(y1, 0.0).astype(xt.dtype).reshape(th + 2, tw + 16, Cm)
    # cb2's SAME padding zero-pads the *activation* y1 at image borders; on
    # the zero input halo cb1 yields relu(b1) != 0, so zero the halo rows/
    # cols that fall outside the image (interior-tile halos are real
    # neighbor pixels and keep their cb1 values).
    row = jax.lax.broadcasted_iota(jnp.int32, (th + 2, tw + 16, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (th + 2, tw + 16, 1), 1)
    outside = (
        ((row == 0) & (i == 0))
        | ((row == th + 1) & (i == nh - 1))
        | ((col == 7) & (j == 0))
        | ((col == tw + 8) & (j == nw - 1))
    )
    y1 = jnp.where(outside, jnp.zeros_like(y1), y1)

    # -- cb2: 3x3 Cm -> Cm as nine shifted MXU dots ------------------------
    y2 = b2_ref[...] * jnp.ones((th * tw, Cm), jnp.float32)
    for di in range(3):
        for dj in range(3):
            patch = y1[di : di + th, 7 + dj : 7 + dj + tw, :].reshape(th * tw, Cm)
            y2 = y2 + jax.lax.dot_general(
                patch, w2_ref[di * 3 + dj],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    y2 = jnp.maximum(y2, 0.0).astype(xt.dtype)

    # -- cb3: 1x1 Cm -> Cin, + skip, ReLU ----------------------------------
    y3 = jax.lax.dot_general(
        y2, w3_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b3_ref[...]
    skip = xt[1 : 1 + th, 8 : 8 + tw, :]
    y3 = y3.reshape(th, tw, Cin) + skip.astype(jnp.float32)
    out_ref[0] = jnp.maximum(y3, 0.0).astype(out_ref.dtype)


def _pick_tile(
    H: int, W: int, Cin: int, Cm: int, itemsize: int
) -> Tuple[int, int]:
    """Largest (th, tw) dividing H/W whose working set (halo'd input scratch
    + double-buffered in/out blocks + f32 y3 accumulator + resident folded
    weights) fits ~10 MB VMEM. None = this shape can't be fused (e.g.
    layer4's 2048-ch weights alone approach VMEM) — callers fall back to
    the XLA oracle."""
    budget = 10 * 1024 * 1024
    weights = (2 * Cin * Cm + 9 * Cm * Cm) * itemsize
    for th, tw in ((64, 64), (64, 32), (32, 32), (32, 16), (16, 16), (8, 8)):
        need = (
            weights
            + (th + 2) * (tw + 16) * Cin * itemsize  # x scratch (aligned halo)
            + th * tw * Cin * 4                      # y3 f32
            + 4 * th * tw * Cin * itemsize           # in+out blocks, 2x buffered
        )
        if need <= budget and H % th == 0 and W % tw == 0:
            return th, tw
    return None


@functools.partial(jax.jit, static_argnames=("interpret",))
def bottleneck_fused(
    x: jnp.ndarray,
    w1: jnp.ndarray, b1: jnp.ndarray,
    w2: jnp.ndarray, b2: jnp.ndarray,
    w3: jnp.ndarray, b3: jnp.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused stride-1 identity-skip bottleneck. x: [B, H, W, Cin] (bf16 or
    f32); w1 [Cin, Cm], w2 [3, 3, Cm, Cm], w3 [Cm, Cin] BN-folded weights
    (see ``fold_bn``); b* f32 biases. Returns [B, H, W, Cin] in x.dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, W, Cin = x.shape
    Cm = w1.shape[1]
    tile = _pick_tile(H, W, Cin, Cm, jnp.dtype(x.dtype).itemsize)
    if tile is None:  # no VMEM-fitting tiling divides this shape
        return bottleneck_oracle(x, w1, b1, w2, b2, w3, b3)
    th, tw = tile
    nh, nw = H // th, W // tw

    dt = x.dtype
    w2f = w2.reshape(9, Cm, Cm)

    return pl.pallas_call(
        functools.partial(
            _kernel, th=th, tw=tw, nh=nh, nw=nw, H=H, W=W
        ),
        grid=(B, nh, nw),
        in_specs=[
            pl.BlockSpec(  # bulk tile: Mosaic-pipelined VMEM blocks
                (1, th, tw, Cin), lambda b, i, j: (b, i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # same x: halo strips DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, tw, Cin), lambda b, i, j: (b, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cin), dt),
        scratch_shapes=[
            pltpu.VMEM((th + 2, tw + 16, Cin), dt),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(
        x,
        x,
        w1.astype(dt), b1.astype(jnp.float32).reshape(1, Cm),
        w2f.astype(dt), b2.astype(jnp.float32).reshape(1, Cm),
        w3.astype(dt), b3.astype(jnp.float32).reshape(1, Cin),
    )


def bottleneck_oracle(x, w1, b1, w2, b2, w3, b3):
    """jnp reference of the fused block (same math, XLA-scheduled)."""
    dt = x.dtype
    y = jax.lax.conv_general_dilated(
        x, w1[None, None].astype(dt), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + b1
    y = jnp.maximum(y, 0.0).astype(dt)
    y = jax.lax.conv_general_dilated(
        y, w2.astype(dt), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + b2
    y = jnp.maximum(y, 0.0).astype(dt)
    y = jax.lax.conv_general_dilated(
        y, w3[None, None].astype(dt), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + b3
    return jnp.maximum(y + x.astype(jnp.float32), 0.0).astype(dt)
