"""Product quantization (PQ) — asymmetric-distance search over compressed
galleries.

The reference searches f32 descriptors by brute force (SURVEY.md §3.1 hot
loop 2); ``retrieval.knn`` already streams that exactly and ``retrieval.ivf``
bounds HBM traffic by probing. PQ attacks the remaining axis — bytes per
gallery row — far past int8's 4x: descriptors are split into ``M``
subvectors of ``ds = D/M`` dims, each subvector vector-quantized against a
256-entry codebook, so a row stores as ``M`` uint8 codes (``4*ds`` x
compression; e.g. D=2048, M=64 -> 128x, a 1M-row gallery in 64 MB).

Scoring is ADC (asymmetric distance computation) shaped for the TPU:

* per query batch, ONE einsum on the MXU builds the lookup tables
  ``LUT[q, m, v] = <q_m, codebook[m, v]>`` — ``[nq, M, 256]`` f32 lives
  comfortably on device (nq=256, M=64 -> 16 MB);
* the gallery pass streams code blocks ``[chunk, M]`` (uint8 — the whole
  HBM read) and reduces ``score[q, row] = sum_m LUT[q, m, code[row, m]]``;
  two backends score a block: the XLA gather (take-along + sum, exact
  f32) and — on TPU, when the batch shape wins — the Pallas one-hot MXU
  matmul (``ops.pallas.adc_mxu``; 2.7x on hardware, bf16x2 near-f32).
  The running top-k merge is the exact same scan/blockmax/merge machinery
  as ``knn.streaming_topk`` so the deterministic (score desc, row asc)
  tie contract carries over;
* inner-product semantics: codebooks are trained with k-means on the
  subvectors (min L2 reconstruction), and ``<q, x_hat> = sum_m <q_m,
  c_m[code]>`` exactly — ADC is exact scoring OF THE RECONSTRUCTION; the
  approximation is purely the quantization error ``x - x_hat``.

Two-stage refinement (``search(..., refine=R, gallery=...)``) rescores the
top-R ADC candidates against the true f32 rows — the standard PQ serving
shape: ADC prunes N -> R with ~M bytes/row of traffic, exact scoring then
touches only ``R/N`` of the full gallery.

``IVFPQIndex`` composes this with the IVF coarse quantizer
(``retrieval.ivf``): partitions store RESIDUAL codes (``x - centroid``),
and since scoring is inner-product, ``<q, x> = <q, centroid> + <q, r>`` —
the coarse scores the probe already computed are reused as the partition
bias and ONE shared LUT (built from the same codebooks) scores every
probed partition. Per-query probe traffic drops from ``nprobe*L*D*4``
bytes to ``nprobe*L*M``.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from image_retrieval_for_image_based_localization_tpu.retrieval.knn import (
    NEG_INF,
    blockmax_topk,
    merge_topk,
)
from image_retrieval_for_image_based_localization_tpu.ops.pallas import adc_mxu


def _train_codebooks(
    x: np.ndarray, m: int, kmeans_iters: int, train_sample: int, seed: int
) -> np.ndarray:
    """k-means per subspace -> codebooks [M, 256, ds] f32."""
    from image_retrieval_for_image_based_localization_tpu.training.netvlad_init import (
        kmeans,
    )

    n, d = x.shape
    if d % m:
        raise ValueError(f"descriptor dim {d} not divisible by M={m}")
    ds = d // m
    train = x
    if n > train_sample:
        sel = np.random.RandomState(seed).choice(n, train_sample, replace=False)
        train = x[np.sort(sel)]
    sub = train.reshape(-1, m, ds)
    v = min(256, sub.shape[0])  # degenerate tiny corpora
    books = np.zeros((m, 256, ds), np.float32)
    for j in range(m):
        cent, _ = kmeans(
            jnp.asarray(sub[:, j, :]), v, iters=kmeans_iters,
            key=jax.random.PRNGKey(seed + j),
        )
        books[j, :v] = np.asarray(cent)
        if v < 256:  # pad entries duplicate code 0: harmless, never argmin-won
            books[j, v:] = books[j, 0]
    return books


def _decode(codebooks: np.ndarray, codes: np.ndarray) -> np.ndarray:
    """Reconstruct rows from codes: [n, M] uint8 -> [n, D] f32 (host)."""
    M = codebooks.shape[0]
    n = codes.shape[0]
    return codebooks[np.arange(M)[None, :], codes.astype(np.int64)].reshape(
        n, -1)


def _opq_pca_permutation_init(x: np.ndarray, m: int) -> np.ndarray:
    """OPQ-P initialization (Ge et al., CVPR 2013 §4.1, "parametric").

    Rotate into the PCA eigenbasis, then PERMUTE eigen-directions into the
    ``m`` subspaces so the products of per-subspace variances are balanced
    (greedy: eigenvalues in descending order, each assigned to the
    non-full bucket with the smallest current log-product). Balanced
    variance products equalize the subquantizers' workloads — the
    distortion bound is minimized at equal products — which is exactly
    what identity-init alternation fails to find on anisotropic data
    (VERDICT r3 weak #6: MSE moved 0.283->0.259 with no recall uplift).
    Returns an orthogonal ``[D, D]`` R (eigenbasis columns, permuted), the
    alternation's starting point."""
    d = x.shape[1]
    xc = x - x.mean(0)
    w, v = np.linalg.eigh((xc.T @ xc) / max(len(x), 1))
    order = np.argsort(w)[::-1]  # eigenvalues descending
    w, v = w[order], v[:, order]
    buckets: list = [[] for _ in range(m)]
    logprod = np.zeros(m)
    for j in range(d):
        # only buckets at the MINIMUM fill level are eligible: comparing
        # log-products across different counts is meaningless (with all
        # eigenvalues < 1 every assignment makes a bucket MORE attractive,
        # cascading the largest eigenvalues into one bucket — the opposite
        # of balancing)
        lens = [len(b) for b in buckets]
        lo = min(lens)
        b = min((b for b in range(m) if lens[b] == lo),
                key=lambda b: logprod[b])
        buckets[b].append(j)
        logprod[b] += np.log(max(w[j], 1e-12))
    perm = [j for bucket in buckets for j in bucket]
    return v[:, perm].astype(np.float32)


def _train_opq_rotation(
    x: np.ndarray, m: int, opq_iters: int, train_sample: int, seed: int
) -> np.ndarray:
    """OPQ: learn an orthogonal rotation R minimizing PQ reconstruction
    error (Ge et al., CVPR 2013 — the non-parametric alternation, started
    from the parametric PCA-permutation init).

    Alternates (a) train codebooks + encode in the rotated space x@R with
    (b) the orthogonal-Procrustes update R = UVᵀ from SVD(xᵀ x̂). Because R
    is orthogonal, inner products are preserved exactly — ADC scores in
    the rotated space ARE original-space scores of the (rotated-back)
    reconstruction, so refine/exact-rescore semantics need no change.
    Runs on the training subsample; per-iteration k-means is shortened
    (the final full-strength codebook train happens afterwards in
    ``build``)."""
    n, d = x.shape
    if n > train_sample:
        sel = np.random.RandomState(seed).choice(n, train_sample,
                                                 replace=False)
        x = x[np.sort(sel)]
    R = _opq_pca_permutation_init(x, m)
    for _ in range(opq_iters):
        books = _train_codebooks(x @ R, m, kmeans_iters=8,
                                 train_sample=train_sample, seed=seed)
        bj = jnp.asarray(books)
        codes = np.asarray(_encode(bj, jnp.asarray(x @ R)))
        xhat = _decode(books, codes)
        # orthogonal Procrustes: argmin_R ||xR - x̂||_F, R orthogonal
        u, _, vt = np.linalg.svd(
            np.asarray(
                jnp.einsum("nd,ne->de", jnp.asarray(x), jnp.asarray(xhat),
                           preferred_element_type=jnp.float32)
            )
        )
        R = (u @ vt).astype(np.float32)
    return R


@functools.partial(jax.jit, static_argnames=())
def _encode(codebooks: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Nearest codebook entry per subspace: [n, D] -> [n, M] uint8.

    argmin ||x_m - c||^2 over the 256 entries = argmax (2<x_m,c> - ||c||^2),
    one batched MXU matmul per call; ties -> lowest code (jnp.argmax).
    """
    n, d = x.shape
    M, V, ds = codebooks.shape
    xs = x.reshape(n, M, ds)
    xc = jnp.einsum(
        "nms,mvs->nmv", xs, codebooks, preferred_element_type=jnp.float32
    )
    c_sq = jnp.sum(codebooks * codebooks, axis=2)  # [M, V]
    return jnp.argmax(2.0 * xc - c_sq[None], axis=2).astype(jnp.uint8)


def _build_luts(codebooks: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Inner-product lookup tables: [nq, M, 256] f32, one einsum."""
    nq, d = q.shape
    M, V, ds = codebooks.shape
    return jnp.einsum(
        "qms,mvs->qmv",
        q.reshape(nq, M, ds),
        codebooks,
        preferred_element_type=jnp.float32,
    )


def _adc_block(lut: jnp.ndarray, codes_block: jnp.ndarray) -> jnp.ndarray:
    """ADC scores for one code block: LUT [nq,M,256] x codes [c,M] -> [nq,c].

    take_along_axis gathers [nq, M, c] then reduces over M; XLA fuses the
    gather into the reduction so the intermediate never hits HBM — the
    block's HBM read is the uint8 codes alone.
    """
    idx = codes_block.T.astype(jnp.int32)[None]          # [1, M, c]
    g = jnp.take_along_axis(lut, idx, axis=2)            # [nq, M, c]
    return jnp.sum(g, axis=1)                            # [nq, c]


def _resolve_adc_backend(backend: str, nq: int, n: int, m: int, v: int) -> str:
    """'auto' -> 'mxu' on TPU where the one-hot matmul wins, else 'gather'."""
    if backend != "auto":
        return backend
    if jax.default_backend() != "tpu" or v != 256:
        return "gather"
    return adc_mxu.recommend_backend(nq, n, m)


def adc_topk_core(
    lut: jnp.ndarray,     # [nq, M, 256] f32
    codes: jnp.ndarray,   # [N, M] uint8
    k: int,
    chunk: int,
    n_valid=None,         # traced-ok: rows >= n_valid score NEG_INF
    index_offset=0,       # traced-ok: global row id of local row 0
    backend: str = "auto",  # 'gather' | 'mxu' | 'auto' (static under jit)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming ADC top-k over a code matrix (knn.streaming_topk shape).

    shard_map-safe: ``n_valid``/``index_offset`` may be traced values, so
    a gallery-axis shard can mask its pad rows and emit GLOBAL row ids
    (mirrors ``knn.streaming_topk``'s contract for ``sharded_knn``).

    ``backend='mxu'`` scores blocks with the Pallas one-hot matmul
    (``ops.pallas.adc_mxu`` — 2.7x on hardware at the bench point,
    bf16x2 near-f32: rel ~3e-6, so near-tie rows MAY order differently
    than the f32 gather; the (score desc, row asc) tie contract itself
    is unchanged).  'auto' picks it on TPU when the batch shape wins.
    Scoring is per-row, so shard results stay identical to single-device
    runs as long as both use the same backend.
    """
    N, M = codes.shape
    nq = lut.shape[0]
    backend = _resolve_adc_backend(backend, nq, N, M, lut.shape[2])
    if n_valid is None:
        n_valid = N
    k = min(k, N)                      # a shard can't supply more rows
    chunk = min(max(chunk, k), N)      # blockmax needs k <= block width
    if backend == "mxu":
        # chunks feed the kernel whole: round to its 512-row grid step
        br = adc_mxu.BLOCK_ROWS
        chunk = -(-chunk // br) * br
        hi, lo = adc_mxu.prepare_lut_tables(lut)
        # Widen codes BEFORE the scan: dynamic-slicing uint8 blocks out of
        # the scanned operand costs a (8,128)->(32,128)-tile repack per
        # step (+33 ms at the bench point, measured); i32 blocks slice
        # clean and the kernel's in-kernel cast becomes a no-op.  4x the
        # HBM read (25.6 MB at N=100k/M=64) is cheap next to that.
        codes = codes.astype(jnp.int32)
        interp = jax.default_backend() != "tpu"   # CPU tests run interpret

        def score_block(block):                    # [chunk, M] -> [nq, chunk]
            s = adc_mxu.adc_scores_mxu(block, hi, lo, interpret=interp)
            return s[:, :nq].T
    else:
        def score_block(block):
            return _adc_block(lut, block)

    nchunks = -(-N // chunk)
    pad = nchunks * chunk - N
    if pad:
        codes = jnp.pad(codes, ((0, pad), (0, 0)))
    cblocks = codes.reshape(nchunks, chunk, M)
    starts = jnp.arange(nchunks, dtype=jnp.int32) * chunk

    init = (
        jnp.full((nq, k), NEG_INF, jnp.float32),
        jnp.full((nq, k), jnp.iinfo(jnp.int32).max, jnp.int32),
    )

    def body(carry, inp):
        cur_s, cur_i = carry
        block, cstart = inp
        s = score_block(block)
        lidx = cstart + jax.lax.broadcasted_iota(jnp.int32, (nq, chunk), 1)
        s = jnp.where(lidx < n_valid, s, NEG_INF)
        cs, cpos = blockmax_topk(s, k)
        cand_s = jnp.concatenate([cur_s, cs], axis=1)
        cand_i = jnp.concatenate([cur_i, index_offset + cstart + cpos], axis=1)
        return merge_topk(cand_s, cand_i, k), None

    (scores, idx), _ = jax.lax.scan(body, init, (cblocks, starts))
    return scores, idx


@functools.partial(jax.jit, static_argnames=("k", "chunk", "backend"))
def _adc_search(
    codebooks: jnp.ndarray,
    codes: jnp.ndarray,   # [N, M] uint8
    q: jnp.ndarray,       # [nq, D] f32
    k: int,
    chunk: int,
    backend: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    lut = _build_luts(codebooks, q)
    return adc_topk_core(lut, codes, k=k, chunk=chunk, backend=backend)


@functools.partial(jax.jit, static_argnames=("k",))
def _exact_rescore(
    gallery: jnp.ndarray, q: jnp.ndarray, cand: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact-score candidate rows and take top-k with the tie contract.

    cand [nq, R] global rows, R >= k. Candidates arrive ADC-score-ordered;
    re-sorting them ascending by row id restores the index-monotonic
    precondition merge_topk's stable top_k needs for lower-row-wins ties.
    Rows >= len(gallery) are overflow sentinels (an under-filled probe):
    they score NEG_INF and sort last, so they can only surface as NEG_INF
    fill when fewer than k real candidates exist.
    """
    n = gallery.shape[0]
    cand = jnp.sort(cand, axis=1)
    sub = jnp.take(gallery, jnp.clip(cand, 0, n - 1), axis=0)  # [nq, R, D]
    return rescore_rows(sub, q, cand, n, k=k)


@functools.partial(jax.jit, static_argnames=("k",))
def rescore_rows(
    sub: jnp.ndarray, q: jnp.ndarray, cand: jnp.ndarray, n, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact-score pre-gathered candidate rows ``sub [nq, R, D]`` against
    queries and take top-k. ``cand`` must be ascending per row (the tie
    contract's index-monotonic precondition); rows >= n score NEG_INF.
    Used directly by the sharded PQ path, where the f32 gallery lives on
    host and the [nq, R, D] gather happens there."""
    s = jnp.einsum(
        "qd,qrd->qr", q.astype(sub.dtype), sub,
        preferred_element_type=jnp.float32,
    )
    s = jnp.where(cand < n, s, NEG_INF)
    return merge_topk(s, cand, k)


class PQIndex:
    """PQ-compressed gallery: codes [N, M] uint8 + codebooks [M, 256, ds].

    ``rotation`` (optional ``[D, D]`` orthogonal, from OPQ training) maps
    descriptors into the space the codebooks live in; queries are rotated
    at search time. Inner products are preserved by orthogonality, so
    every downstream contract (refine, tie order on equal scores) is
    unchanged."""

    def __init__(self, codebooks: np.ndarray, codes: np.ndarray, n: int,
                 rotation: Optional[np.ndarray] = None):
        self.codebooks = np.asarray(codebooks, np.float32)
        self.codes = np.asarray(codes, np.uint8)
        self.n = int(n)
        self.rotation = (None if rotation is None
                         else np.asarray(rotation, np.float32))
        self._dev = None

    @property
    def compression(self) -> float:
        M, _, ds = self.codebooks.shape
        return (M * ds * 4) / M  # f32 bytes per row / code bytes per row

    @classmethod
    def build(
        cls,
        gallery: np.ndarray,
        m: Optional[int] = None,
        kmeans_iters: int = 25,
        train_sample: int = 262_144,
        seed: int = 0,
        opq_iters: int = 0,
    ) -> "PQIndex":
        """Train codebooks on the gallery and encode it.

        ``m`` (code bytes per row) defaults to ``D/32`` — 128x compression —
        clamped to a divisor of D in [4, 256]. ``opq_iters > 0`` first
        learns an OPQ rotation (``_train_opq_rotation``) and trains/encodes
        in the rotated space — better codebook fit when variance is spread
        unevenly across the subspace split, at identical search cost (one
        extra [nq, D]x[D, D] query rotation).
        """
        g = np.asarray(gallery, np.float32)
        n, d = g.shape
        if m is None:
            m = max(4, min(256, d // 32))
            while d % m:
                m -= 1
        rotation = None
        if opq_iters:
            rotation = _train_opq_rotation(g, m, opq_iters, train_sample,
                                           seed)
            g = g @ rotation
        books = _train_codebooks(g, m, kmeans_iters, train_sample, seed)
        bj = jnp.asarray(books)
        codes = np.empty((n, m), np.uint8)
        step = 65536
        for i in range(0, n, step):
            codes[i : i + step] = np.asarray(_encode(bj, jnp.asarray(g[i : i + step])))
        return cls(books, codes, n, rotation=rotation)

    def _device(self):
        if self._dev is None:
            self._dev = (jnp.asarray(self.codebooks), jnp.asarray(self.codes))
        return self._dev

    def search(
        self,
        queries: np.ndarray,
        k: int = 10,
        chunk: int = 65536,
        refine: int = 0,
        gallery: Optional[np.ndarray] = None,
        backend: str = "auto",
    ) -> Tuple[np.ndarray, np.ndarray]:
        """ADC top-k: ``(scores [nq,k], gallery rows [nq,k])``.

        ``refine=R`` (with the f32 ``gallery``) takes the top-R ADC
        candidates and exact-rescoring decides the final top-k — scores
        returned are then TRUE inner products, and ranking equals exact
        search whenever the true top-k survives the ADC cut (recall@R
        corridor pinned in tests).

        ``backend`` ('auto'|'gather'|'mxu') picks the ADC scoring path;
        'auto' uses the Pallas one-hot MXU kernel on TPU when the batch
        shape wins (see ``ops.pallas.adc_mxu``).
        """
        books, codes = self._device()
        q = np.atleast_2d(np.asarray(queries, np.float32))
        # ADC runs in the (rotated) codebook space; exact rescoring uses
        # the ORIGINAL query against the unrotated gallery — orthogonality
        # makes the two scores identical for exact reconstructions
        q_adc = q if self.rotation is None else q @ self.rotation
        k_eff = min(k, self.n)
        if refine:
            if gallery is None:
                raise ValueError("refine requires the f32 gallery")
            R = min(max(refine, k_eff), self.n)
            _, cand = _adc_search(books, codes, jnp.asarray(q_adc), k=R,
                                  chunk=min(chunk, self.n), backend=backend)
            s, i = _exact_rescore(jnp.asarray(gallery), jnp.asarray(q),
                                  cand, k=k_eff)
        else:
            s, i = _adc_search(books, codes, jnp.asarray(q_adc), k=k_eff,
                               chunk=min(chunk, self.n), backend=backend)
        return np.asarray(s), np.asarray(i)

    # -- persistence ---------------------------------------------------------

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        extra = {}
        if self.rotation is not None:
            extra["rotation"] = self.rotation
        np.savez_compressed(
            path, codebooks=self.codebooks, codes=self.codes,
            meta=np.frombuffer(
                json.dumps({"n": self.n, "version": 1}).encode(), np.uint8),
            **extra,
        )

    @classmethod
    def load(cls, path: str) -> "PQIndex":
        if not path.endswith(".npz"):
            path += ".npz"
        z = np.load(path, allow_pickle=False)
        meta = json.loads(bytes(z["meta"]).decode())
        rot = z["rotation"] if "rotation" in z.files else None
        return cls(z["codebooks"], z["codes"], meta["n"], rotation=rot)


def load_pq_artifact(path: str):
    """Load a ``.pq.npz`` / ``.ivfpq.npz`` artifact, auto-detecting flat PQ
    vs IVF-PQ by the arrays it carries (IVF-PQ stores ``centroids``)."""
    if not path.endswith(".npz"):
        path += ".npz"
    with np.load(path, allow_pickle=False) as z:
        is_ivfpq = "centroids" in z.files
    return (IVFPQIndex if is_ivfpq else PQIndex).load(path)


# ---------------------------------------------------------------------------
# IVF-PQ: residual codes inside IVF partitions
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "nprobe"))
def _ivfpq_search_chunk(
    cent, codes, lengths, row_ids, codebooks, q, q_lut, k: int, nprobe: int
):
    """IVF probe scored by residual ADC (ivf._ivf_search_chunk shape).

    codes: [C, L, M] uint8 residual codes. score = coarse + ADC(residual):
    the probe's coarse scores double as the partition bias. ``q_lut`` is
    the query in the CODEBOOK space (== q, or q @ rotation for OPQ —
    orthogonality keeps <q, r> == <qR, rR>, so the decomposition
    <q, x> = <q, c> + <q_lut, r_rot> stays exact); coarse scoring always
    uses the original-space ``q`` and centroids.
    """
    cs = jax.lax.dot_general(
        q, cent, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    probe_s, probe = jax.lax.top_k(cs, nprobe)         # [nq, P]
    sub = jnp.take(codes, probe, axis=0)               # [nq, P, L, M] uint8
    lut = _build_luts(codebooks, q_lut)                # [nq, M, 256]
    # gather residual scores: LUT[q, m, sub[q,p,l,m]] summed over m
    nq, P, L, M = sub.shape
    idx = sub.transpose(0, 3, 1, 2).reshape(nq, M, P * L).astype(jnp.int32)
    g = jnp.take_along_axis(lut, idx, axis=2)          # [nq, M, P*L]
    scores = jnp.sum(g, axis=1).reshape(nq, P, L) + probe_s[:, :, None]
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
        < jnp.take(lengths, probe, axis=0)[:, :, None]
    )
    rows = jnp.take(row_ids, probe, axis=0)
    # pad rows: NEG_INF score AND sentinel row id, so an under-filled probe
    # can't smuggle duplicate row-0 candidates into the refine stage
    scores = jnp.where(valid, scores, NEG_INF)
    rows = jnp.where(valid, rows, jnp.iinfo(jnp.int32).max)
    flat_s = scores.reshape(nq, -1)
    flat_r = rows.reshape(nq, -1)
    s_top, pos = jax.lax.top_k(flat_s, k)
    r_top = jnp.take_along_axis(flat_r, pos, axis=1)
    order = jnp.lexsort((r_top, -s_top), axis=1)
    return (
        jnp.take_along_axis(s_top, order, axis=1),
        jnp.take_along_axis(r_top, order, axis=1),
    )


class IVFPQIndex:
    """IVF coarse quantizer + PQ residual codes per partition.

    ``rotation`` (optional, OPQ over residuals): the residuals were rotated
    before encoding; queries are rotated for the LUT build only — coarse
    scoring stays in the original space (a global orthogonal rotation
    commutes with inner-product argmax, so probing is unaffected)."""

    def __init__(self, centroids, codes, lengths, row_ids, codebooks, n,
                 rotation: Optional[np.ndarray] = None):
        self.centroids = np.asarray(centroids, np.float32)
        self.codes = np.asarray(codes, np.uint8)       # [C, L, M]
        self.lengths = np.asarray(lengths, np.int32)
        self.row_ids = np.asarray(row_ids, np.int32)
        self.codebooks = np.asarray(codebooks, np.float32)
        self.n = int(n)
        self.rotation = (None if rotation is None
                         else np.asarray(rotation, np.float32))
        self._dev = None

    @classmethod
    def from_ivf(
        cls,
        ivf,
        m: Optional[int] = None,
        kmeans_iters: int = 25,
        train_sample: int = 262_144,
        seed: int = 0,
        opq_iters: int = 0,
    ) -> "IVFPQIndex":
        """Encode an f32 ``IVFIndex``'s partitions as PQ residual codes.

        Residuals (row - its centroid) are what PQ quantizes — they are
        much smaller than raw descriptors once the coarse quantizer has
        soaked up the cluster mean, so the same M spends its code entropy
        on the informative part.
        """
        if getattr(ivf, "dtype", "f32") != "f32":
            raise ValueError(
                "IVFPQIndex.from_ivf needs f32 partitions (build the IVF "
                f"with dtype='f32', got {ivf.dtype!r}) — residuals of "
                "already-quantized rows would double-compress"
            )
        parts = np.asarray(ivf.partitions, np.float32)  # [C, L, D]
        C, L, D = parts.shape
        if m is None:
            m = max(4, min(256, D // 32))
            while D % m:
                m -= 1
        valid = (
            np.arange(L)[None, :] < ivf.lengths[:, None]
        )                                                # [C, L]
        resid = parts - ivf.centroids[:, None, :]
        train = resid[valid]                             # [n, D] real rows
        rotation = None
        if opq_iters:
            rotation = _train_opq_rotation(train, m, opq_iters,
                                           train_sample, seed)
            train = train @ rotation
            resid = resid @ rotation
        books = _train_codebooks(train, m, kmeans_iters, train_sample, seed)
        bj = jnp.asarray(books)
        flat = resid.reshape(C * L, D)
        codes = np.empty((C * L, m), np.uint8)
        step = 65536
        for i in range(0, C * L, step):
            codes[i : i + step] = np.asarray(
                _encode(bj, jnp.asarray(flat[i : i + step]))
            )
        return cls(ivf.centroids, codes.reshape(C, L, m), ivf.lengths,
                   ivf.row_ids, books, ivf.n, rotation=rotation)

    def _device(self):
        if self._dev is None:
            self._dev = (
                jnp.asarray(self.centroids), jnp.asarray(self.codes),
                jnp.asarray(self.lengths), jnp.asarray(self.row_ids),
                jnp.asarray(self.codebooks),
            )
        return self._dev

    def search(
        self,
        queries: np.ndarray,
        k: int = 10,
        nprobe: int = 8,
        chunk: int = 32,
        refine: int = 0,
        gallery: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Approximate top-k over probed partitions, residual-ADC scored."""
        cent, codes, lengths, row_ids, books = self._device()
        C, L, M = codes.shape
        P = min(nprobe, C)
        k_stage = min(max(refine, k) if refine else k, P * L, self.n)
        q = np.atleast_2d(np.asarray(queries, np.float32))
        q_lut = q if self.rotation is None else q @ self.rotation
        outs, outi = [], []
        for i in range(0, q.shape[0], chunk):
            s, r = _ivfpq_search_chunk(
                cent, codes, lengths, row_ids, books,
                jnp.asarray(q[i : i + chunk]),
                jnp.asarray(q_lut[i : i + chunk]), k=k_stage, nprobe=P,
            )
            outs.append(s)
            outi.append(r)
        s = jnp.concatenate(outs)
        r = jnp.concatenate(outi)
        if refine:
            if gallery is None:
                raise ValueError("refine requires the f32 gallery")
            # overflow slots (under-filled probe) carry int32-max sentinel
            # rows; _exact_rescore scores them NEG_INF so they can only
            # surface as fill when fewer than k real candidates exist.
            # k is additionally clamped to the candidate width k_stage
            # (<= nprobe*L probed rows) — same clamp the unrefined path
            # already applies
            s, r = _exact_rescore(
                jnp.asarray(gallery), jnp.asarray(q), r,
                k=min(k, self.n, k_stage),
            )
        from image_retrieval_for_image_based_localization_tpu.retrieval.knn import (
            sanitize_fill_rows,
        )

        s = np.asarray(s)
        return s, sanitize_fill_rows(s, r)

    # -- persistence ---------------------------------------------------------

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        extra = {}
        if self.rotation is not None:
            extra["rotation"] = self.rotation
        np.savez_compressed(
            path, centroids=self.centroids, codes=self.codes,
            lengths=self.lengths, row_ids=self.row_ids,
            codebooks=self.codebooks,
            meta=np.frombuffer(
                json.dumps({"n": self.n, "version": 1}).encode(), np.uint8),
            **extra,
        )

    @classmethod
    def load(cls, path: str) -> "IVFPQIndex":
        if not path.endswith(".npz"):
            path += ".npz"
        z = np.load(path, allow_pickle=False)
        meta = json.loads(bytes(z["meta"]).decode())
        rot = z["rotation"] if "rotation" in z.files else None
        return cls(z["centroids"], z["codes"], z["lengths"], z["row_ids"],
                   z["codebooks"], meta["n"], rotation=rot)
