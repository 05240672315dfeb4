"""Exact brute-force kNN over a descriptor gallery (single device).

The reference's matcher is a dense BLAS matmul + host argsort
(`scores = vecs.T @ qvecs; ranks = argsort(-scores)` — SURVEY.md §3.1 hot
loop 2). TPU-native redesign: the score matrix is a blocked MXU matmul over
gallery chunks streamed from HBM, with a running top-k merge per chunk
(``lax.top_k`` on the concatenation of carried and fresh candidates) inside a
``lax.scan`` — O(k + chunk) memory per query instead of O(N), which is what
lets a 1M-descriptor gallery stream. The multi-chip version
(``parallel.sharded_index``) runs this same core per shard and merges.

Tie-breaking: lower-index-wins on exact ties, matching NumPy
``argsort(-scores, kind='stable')`` so ranking parity with the reference is
exact on identical score matrices.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = float(np.finfo(np.float32).min)


def sanitize_fill_rows(scores, rows) -> np.ndarray:
    """Host-boundary fill contract: slots that never matched a real gallery
    row (score == NEG_INF — real cosine/IP scores are finite) return row
    ``-1``, never a fabricated id. Approximate searches (IVF family) can
    under-fill when k exceeds the probed rows; without this, pad slots
    surface either as duplicate row 0 or as int32-max device sentinels,
    both of which downstream name-mapping would faithfully mis-serve."""
    scores = np.asarray(scores)
    return np.where(scores <= NEG_INF / 2, -1, np.asarray(rows))


def score_matrix(gallery: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    """Dense similarity scores ``[Nq, Ng] = queries @ gallery.T`` in f32 on MXU.

    Handles mixed-precision galleries: int8 storage (symmetric /127
    quantization of unit-norm descriptors) is dequantized in-flight — fused
    into the chunk matmul, never materialized — and scores are rescaled to
    the cosine range; bf16 galleries pull the queries down to bf16 so the
    MXU runs at bf16 rate with f32 accumulation.
    """
    scale = None
    if gallery.dtype == jnp.int8:
        gallery = gallery.astype(jnp.float32)
        scale = 1.0 / 127.0
        queries = queries.astype(jnp.float32)
    elif gallery.dtype != queries.dtype:
        queries = queries.astype(gallery.dtype)
    s = jax.lax.dot_general(
        queries,
        gallery,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return s if scale is None else s * scale


def merge_topk(
    scores: jnp.ndarray, idx: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k by score with deterministic lower-index-wins tie-breaking.

    PRECONDITION (holds everywhere this is called, and is what makes the
    merge argsort-free): the candidate list is a concatenation of blocks
    whose index ranges are monotonically increasing block-to-block (carried
    top-k from earlier chunks, then the fresh chunk; or shard 0..S partials
    from an all_gather), and each block is internally tie-ordered
    lower-index-first. ``lax.top_k`` is stable (first occurrence wins on
    equal values), so under that precondition the merged result keeps exact
    NumPy ``argsort(-scores, kind='stable')`` tie semantics with no sort —
    removing the per-merge argsort took the 100k-gallery query benchmark
    from ~384 to >>1k queries/sec.
    """
    top_scores, pos = jax.lax.top_k(scores, k)
    return top_scores, jnp.take_along_axis(idx, pos, axis=-1)


def _auto_block(N: int, k: int) -> int:
    """Block size minimizing total TopK width ``N/block + k*block``: the
    optimum is ``sqrt(N/k)``, rounded to a power of two in [8, 512]. At the
    benchmark shape [256 x 100k, k=100] this picks 32 (vs the historical
    fixed 128), shrinking the gathered candidate row 4x — the final TopK
    custom-call was the single largest device cost of a search (PERF.md)."""
    b = int(np.sqrt(max(N, 1) / max(k, 1)))
    b = 1 << max(3, min(9, b.bit_length() - (0 if b & (b - 1) else 1)))
    return b


def blockmax_topk(
    scores: jnp.ndarray, k: int, block: int | None = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact hierarchical top-k over ``scores [Q, N]`` — much faster than a
    flat ``lax.top_k`` on long rows (17ms -> ~3ms at [256, 100k] on v5e).

    Phase 1 reduces each ``block``-lane group to its max (VPU-cheap); phase
    2 selects the top-k *blocks* — a k-element superset argument shows every
    global top-k element lives in one of them: if an element e of the global
    top-k sat in a non-selected block, the k selected blocks would each hold
    an element > e, contradicting e's membership. Phase 3 gathers only those
    blocks (k*block candidates) and recurses until the row is short enough
    for a flat exact top-k.

    Round-4 redesign (the VERDICT r3 "2.55x selection overhead" item):

      * ``block=None`` auto-sizes to ``sqrt(N/k)`` (see ``_auto_block``) so
        the two TopK widths ``N/block`` and ``k*block`` balance;
      * rows that are not a multiple of ``block`` are handled by splitting
        off the tail remainder and unconditionally appending it to the
        candidate row instead of padding — the old ``jnp.pad`` materialized
        a full copy of the score matrix (102 MB at the benchmark shape);
      * phase 3 recurses on the gathered candidates while they stay long
        (> max(4096, 4k)): each level is exact by the same superset
        argument, and the candidate row stays index-monotonic so stability
        composes.

    Tie parity with stable argsort: selected block indices are re-sorted
    ascending before the gather, so the candidate row is index-monotonic and
    the stable final top_k keeps lower-index-wins semantics. The boundary
    case (blocks tying at the k-th max) is safe because stable block
    selection keeps the lowest-indexed tying blocks — exactly the ones
    holding the lowest-indexed tying elements a stable argsort would pick.
    The always-included tail only adds candidates, so the superset argument
    is unaffected, and its indices are the row's largest so monotonicity is
    preserved.
    """
    Q, N = scores.shape
    if block is None:
        block = _auto_block(N, k)
    if N <= max(2 * k, 4 * block, 4096):
        return jax.lax.top_k(scores, min(k, N))
    nb = N // block                  # full blocks; remainder becomes the tail
    if nb <= k:
        # no block pruning possible (every block would be selected) — the
        # recursion would not shrink the row; fall back to the flat select
        return jax.lax.top_k(scores, min(k, N))
    rem = N - nb * block
    main = scores[:, : nb * block].reshape(Q, nb, block)
    bmax = jnp.max(main, axis=-1)                    # [Q, nb]
    kb = min(k, nb)
    _, bidx = jax.lax.top_k(bmax, kb)                # [Q, kb]
    bidx = jnp.sort(bidx, axis=-1)                   # index-monotonic gather
    cand = jnp.take_along_axis(main, bidx[..., None], axis=1).reshape(
        Q, kb * block
    )
    cidx = (
        bidx[..., None] * block
        + jax.lax.broadcasted_iota(jnp.int32, (Q, kb, block), 2)
    ).reshape(Q, kb * block)
    if rem:
        cand = jnp.concatenate([cand, scores[:, nb * block :]], axis=1)
        tidx = jnp.broadcast_to(
            jnp.arange(nb * block, N, dtype=jnp.int32), (Q, rem)
        )
        cidx = jnp.concatenate([cidx, tidx], axis=1)
    top, pos = blockmax_topk(cand, min(k, N))
    return top, jnp.take_along_axis(cidx, pos, axis=-1)


def auto_chunk(Ng: int, Nq: int, budget_bytes: int = 256 * 1024 * 1024) -> int:
    """Largest gallery chunk whose score block [Nq, chunk] fits the budget.

    Bigger chunks amortize the per-chunk selection; a single chunk (no scan)
    is fastest when the dense score block fits comfortably in HBM.
    """
    per_row = max(Nq, 1) * 4
    chunk = budget_bytes // per_row
    chunk = max(16384, (chunk // 128) * 128)
    return min(Ng, chunk)


def streaming_topk(
    gallery: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    chunk: int | None = None,
    n_valid: int | jnp.ndarray | None = None,
    index_offset: int | jnp.ndarray = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Core streaming top-k: scan gallery chunks, carry the running top-k.

    Shard-safe: ``n_valid`` masks padded gallery rows (scores -> -inf),
    ``index_offset`` maps local row numbers to global gallery indices. Both
    may be traced values, so this composes with ``shard_map``.
    """
    Ng, D = gallery.shape
    Nq = queries.shape[0]
    k = min(k, Ng)
    if chunk is None:
        chunk = auto_chunk(Ng, Nq)
    chunk = min(chunk, Ng)
    if n_valid is None:
        n_valid = Ng

    if (
        chunk >= Ng
        and isinstance(n_valid, int)
        and n_valid == Ng
        and isinstance(index_offset, int)
        and index_offset == 0
    ):
        # Single-chunk fast path (the benchmark shape: the whole score block
        # fits the budget). Skips the scan machinery, the iota/where validity
        # mask (a full elementwise pass over the score matrix), and the
        # NEG_INF-carry merge — selection runs straight on the dense scores.
        # Only taken when masking/offsets are statically no-ops, so results
        # are bitwise-identical to the scan path (same score_matrix, same
        # stable blockmax selection).
        return blockmax_topk(score_matrix(gallery, queries), k)

    nchunks = -(-Ng // chunk)
    pad = nchunks * chunk - Ng
    if pad:
        gallery = jnp.pad(gallery, ((0, pad), (0, 0)))
    gblocks = gallery.reshape(nchunks, chunk, D)

    init_scores = jnp.full((Nq, k), NEG_INF, dtype=jnp.float32)
    init_idx = jnp.full((Nq, k), jnp.iinfo(jnp.int32).max, dtype=jnp.int32)

    def body(carry, inp):
        cur_s, cur_i = carry
        block, cstart = inp
        s = score_matrix(block, queries)  # [Nq, chunk]
        lidx = cstart + jax.lax.broadcasted_iota(jnp.int32, (Nq, chunk), 1)
        s = jnp.where(lidx < n_valid, s, NEG_INF)
        # hierarchical chunk-local selection first: merge [k + k] instead of
        # [k + chunk] — the flat top_k over long rows is the bottleneck
        cs, cpos = blockmax_topk(s, k)
        ci = cstart + cpos
        cand_s = jnp.concatenate([cur_s, cs], axis=1)
        cand_i = jnp.concatenate([cur_i, ci + index_offset], axis=1)
        return merge_topk(cand_s, cand_i, k), None

    starts = jnp.arange(nchunks, dtype=jnp.int32) * chunk
    (scores, idx), _ = jax.lax.scan(body, (init_scores, init_idx), (gblocks, starts))
    return scores, idx


@functools.partial(
    jax.jit, static_argnames=("k", "chunk", "recall_target")
)
def approx_topk(
    gallery: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    recall_target: float = 0.95,
    chunk: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Approximate top-k via the TPU's partial-reduction TopK hardware path.

    ``lax.approx_max_k`` is XLA's TPU-native ANN primitive (the
    "TPU-KNN: K Nearest Neighbor Search at Peak FLOP/s" reduction): the VPU
    keeps one running max per 128-lane bin across L gallery tiles, where L
    is solved from ``recall_target`` under a random-permutation model, then
    a tiny exact top-k over the ~L*128 bin winners produces the result. It
    replaces the exact path's dominant cost — the full TopK custom-call /
    blockmax select — with a near-free streaming reduction, so throughput
    approaches the dense-matmul floor while recall stays at the target.

    Search-family position: IVF prunes *score work* (probes a subset of
    partitions) and PQ compresses *storage*; ``approx_topk`` still scores
    every row at full precision on the MXU and approximates only the
    *selection*, so its recall is corpus-shape-independent (no cluster
    mismatch risk) — the right tier when the matmul is affordable but the
    exact selection is not. CPU/GPU backends lower it to exact ``top_k``
    (recall 1.0), so tests on the CPU platform assert exactness and the
    recall target is exercised statistically on hardware (PERF.md).

    Contracts vs ``knn_search``: scores/indices come back sorted descending
    like the exact path, mixed-precision galleries (bf16 / int8-dequant)
    reuse ``score_matrix``, and ``n_valid``-style masking is not needed
    (single-device entry). Tie-breaking is NOT the stable lower-index-wins
    order — an approximate method has no rank-parity contract; anything
    needing exact reference semantics uses ``knn_search``.

    Streaming: galleries too large for a dense [Nq, Ng] score block are
    scanned in chunks with per-chunk ``approx_max_k`` and an exact merge of
    the carried candidates. Every true global top-k element is inside its
    own chunk's true top-k (k kept per chunk), so per-chunk expected recall
    >= target implies overall expected recall >= target.
    """
    if not 0.0 < recall_target <= 1.0:
        raise ValueError(
            f"recall_target must be in (0, 1], got {recall_target}")
    Ng, D = gallery.shape
    Nq = queries.shape[0]
    k = min(k, Ng)
    if chunk is None:
        chunk = auto_chunk(Ng, Nq)
    chunk = min(chunk, Ng)

    if chunk >= Ng:
        s = score_matrix(gallery, queries)  # [Nq, Ng]
        return jax.lax.approx_max_k(s, k, recall_target=recall_target)

    nchunks = -(-Ng // chunk)
    pad = nchunks * chunk - Ng
    if pad:
        gallery = jnp.pad(gallery, ((0, pad), (0, 0)))
    gblocks = gallery.reshape(nchunks, chunk, D)

    init_scores = jnp.full((Nq, k), NEG_INF, dtype=jnp.float32)
    init_idx = jnp.full((Nq, k), jnp.iinfo(jnp.int32).max, dtype=jnp.int32)

    # approx_max_k needs k <= reduction dim; clamp the per-chunk selection
    # (the carry still holds k slots — the cross-chunk merge fills them,
    # mirroring blockmax_topk's min(k, N) clamp)
    kc = min(k, chunk)

    def body(carry, inp):
        cur_s, cur_i = carry
        block, cstart = inp
        s = score_matrix(block, queries)  # [Nq, chunk]
        lidx = cstart + jax.lax.broadcasted_iota(jnp.int32, (Nq, chunk), 1)
        s = jnp.where(lidx < Ng, s, NEG_INF)  # mask the tail-pad rows
        cs, cpos = jax.lax.approx_max_k(s, kc, recall_target=recall_target)
        ci = cstart + cpos
        cand_s = jnp.concatenate([cur_s, cs], axis=1)
        cand_i = jnp.concatenate([cur_i, ci], axis=1)
        return merge_topk(cand_s, cand_i, k), None

    starts = jnp.arange(nchunks, dtype=jnp.int32) * chunk
    (scores, idx), _ = jax.lax.scan(body, (init_scores, init_idx), (gblocks, starts))
    return scores, idx


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def knn_search(
    gallery: jnp.ndarray,
    queries: jnp.ndarray,
    k: int,
    chunk: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k search: returns ``(scores [Nq,k], indices [Nq,k])``."""
    return streaming_topk(gallery, queries, k=k, chunk=chunk)


def rank_candidates_core(
    gallery: jnp.ndarray,
    queries: jnp.ndarray,
    cand: jnp.ndarray,
    chunk: int | None = None,
    n_valid: int | jnp.ndarray | None = None,
    index_offset: int | jnp.ndarray = 0,
    psum_axis: str | None = None,
) -> jnp.ndarray:
    """Global 0-based rank of each candidate gallery row, by streaming count.

    mAP needs only the rank *positions* of each query's positive/junk images
    (``evaluation.map``), and a candidate's rank under descending stable
    (lower-index-wins) ordering is a pure count:

        rank(c) = #{g : s_g > s_c} + #{g : s_g == s_c and g < c}

    so the full ``[Ng, Nq]`` score matrix never exists — per chunk we compare
    the fresh scores against the candidates' scores and accumulate counts.
    Two passes over the gallery (one to read the candidates' own scores out
    of the chunked score blocks, one to count); both use the same chunk
    shapes so candidate scores are bit-identical to the scores they're
    compared with, preserving exact NumPy ``argsort(kind='stable')`` tie
    semantics (verified on adversarial duplicate galleries).

    Shard-safe like ``streaming_topk``: ``n_valid``/``index_offset`` may be
    traced; with ``psum_axis`` set, per-shard partial candidate scores and
    counts are psum-merged over that mesh axis (candidate scores: exactly one
    shard contributes, others add literal zeros).

    Args:
      cand: ``[Nq, C]`` int32 *global* gallery indices (pad rows with any
        valid index; ignore their output).
    Returns: ``[Nq, C]`` int32 ranks.
    """
    Ng, D = gallery.shape
    Nq, C = cand.shape
    if n_valid is None:
        n_valid = Ng
    if chunk is None:
        # bound the [Nq, chunk, C] compare intermediate
        budget_elems = 32 * 1024 * 1024
        chunk = max(512, budget_elems // max(Nq * C, 1))
        chunk = -(-chunk // 128) * 128
    chunk = min(chunk, Ng)

    nchunks = -(-Ng // chunk)
    pad = nchunks * chunk - Ng
    if pad:
        gallery = jnp.pad(gallery, ((0, pad), (0, 0)))
    gblocks = gallery.reshape(nchunks, chunk, D)
    starts = jnp.arange(nchunks, dtype=jnp.int32) * chunk
    cand = cand.astype(jnp.int32)
    local_cand = cand - index_offset  # [Nq, C] in this shard's row space

    def gather_body(cs, inp):
        block, cstart = inp
        s = score_matrix(block, queries)  # [Nq, chunk]
        lc = local_cand - cstart
        inb = (lc >= 0) & (lc < chunk)
        g = jnp.take_along_axis(s, jnp.clip(lc, 0, chunk - 1), axis=1)
        return jnp.where(inb, g, cs), None

    cs, _ = jax.lax.scan(
        gather_body, jnp.zeros((Nq, C), jnp.float32), (gblocks, starts)
    )
    if psum_axis is not None:
        cs = jax.lax.psum(cs, psum_axis)

    def count_body(cnt, inp):
        block, cstart = inp
        s = score_matrix(block, queries)  # [Nq, chunk]
        lidx = cstart + jax.lax.broadcasted_iota(jnp.int32, (Nq, chunk), 1)
        valid = lidx < n_valid
        gidx = lidx + index_offset
        ahead = (s[:, :, None] > cs[:, None, :]) | (
            (s[:, :, None] == cs[:, None, :])
            & (gidx[:, :, None] < cand[:, None, :])
        )
        ahead = ahead & valid[:, :, None]
        return cnt + jnp.sum(ahead, axis=1, dtype=jnp.int32), None

    counts, _ = jax.lax.scan(
        count_body, jnp.zeros((Nq, C), jnp.int32), (gblocks, starts)
    )
    if psum_axis is not None:
        counts = jax.lax.psum(counts, psum_axis)
    return counts


@functools.partial(jax.jit, static_argnames=("chunk",))
def rank_candidates(
    gallery: jnp.ndarray,
    queries: jnp.ndarray,
    cand: jnp.ndarray,
    chunk: int | None = None,
) -> jnp.ndarray:
    """Single-device entry for ``rank_candidates_core`` (see its docstring)."""
    return rank_candidates_core(gallery, queries, cand, chunk=chunk)


def full_ranks(gallery, queries, batch: int = 256) -> np.ndarray:
    """Full ranking ``[Ng, Nq]`` for mAP evaluation (host-side argsort).

    Matches the reference eval path exactly: dense scores, descending stable
    argsort per query (SURVEY.md §3.1). Queries are batched to bound device
    memory for large galleries.
    """
    gallery = jnp.asarray(gallery)
    Nq = queries.shape[0]
    score_fn = jax.jit(score_matrix)
    ranks = []
    for s in range(0, Nq, batch):
        q = jnp.asarray(queries[s : s + batch])
        scores = np.asarray(score_fn(gallery, q))  # [b, Ng]
        ranks.append(np.argsort(-scores, axis=1, kind="stable").T)  # [Ng, b]
    return np.concatenate(ranks, axis=1)
