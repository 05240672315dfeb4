"""IVF (inverted-file) approximate search: beyond-brute-force gallery scale.

The reference searches by brute force only; this adds the standard
two-level coarse-quantizer search for galleries where exact scoring's HBM
traffic dominates (≳1M rows): k-means partitions the gallery once at
build, each query scores the ``C`` centroids (tiny matmul), probes its
top-``nprobe`` partitions, and exactly scores only those rows —
``nprobe/C`` of the gallery's bytes per query batch.

TPU shape (static everything):

* partitions are a PADDED dense tensor ``[C, L, D]`` (L = largest cluster;
  pad rows are masked by length, not by sentinel vectors, so negative
  true scores can't lose to zero-pad rows). Padding overhead is the
  cluster-balance ratio ``C*L/N`` — reported by ``build`` so operators
  can see it;
* probing is one ``jnp.take`` of the chosen partitions ([chunk, P, L, D]
  HBM traffic — the whole point: this replaces scoring ALL of N) followed
  by one einsum on the MXU and one flat ``lax.top_k``;
* queries are chunked (default 32) to bound the gathered block; k and
  nprobe are static so the program compiles once per configuration.

Exactness: with ``nprobe == C`` results equal exact search on the same
scores (the recall tests pin both this identity and the recall@10 ≥ 0.95
corridor at nprobe = C/8 on clustered data). On real TPU the identity is
up-to-scoring-precision: the default MXU matmul rounds f32 inputs through
bf16 passes, and this kernel's ``[nq,P,L,D]`` einsum tiles the contraction
differently from ``knn_search``'s ``[nq,N]`` dot, so near-ties within
~1e-3 can swap rank positions (hardware-measured max f64 gap 4e-4 at
N=65k, D=256 — see the TPU drive). Bit-exact equality holds whenever both
paths score with the same rounding (CPU f32, or ``precision=HIGHEST``).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

NEG_INF = float(np.finfo(np.float32).min)


class IVFIndex:
    """Coarse-quantized gallery with padded dense partitions."""

    def __init__(
        self,
        centroids: np.ndarray,   # [C, D]
        partitions: np.ndarray,  # [C, L, D] padded (f32 / bf16 / int8)
        lengths: np.ndarray,     # [C] valid rows per partition
        row_ids: np.ndarray,     # [C, L] original gallery row (pad: 0)
        n: int,
        dtype: str = "f32",
    ):
        self.centroids = np.asarray(centroids, np.float32)
        self.dtype = dtype
        if dtype == "f32":
            self.partitions = np.asarray(partitions, np.float32)
        elif dtype == "bf16":
            import ml_dtypes

            self.partitions = np.asarray(partitions, ml_dtypes.bfloat16)
        elif dtype == "int8":
            self.partitions = np.asarray(partitions, np.int8)
        else:
            raise ValueError(f"dtype must be f32/bf16/int8, got {dtype!r}")
        self.lengths = np.asarray(lengths, np.int32)
        self.row_ids = np.asarray(row_ids, np.int32)
        self.n = int(n)
        self._dev = None

    @property
    def pad_ratio(self) -> float:
        C, L, _ = self.partitions.shape
        return C * L / max(self.n, 1)

    @classmethod
    def build(
        cls,
        gallery: np.ndarray,
        n_clusters: Optional[int] = None,
        kmeans_iters: int = 25,
        train_sample: int = 262_144,
        seed: int = 0,
        balance: Optional[float] = 2.0,
        dtype: str = "f32",
    ) -> "IVFIndex":
        """Partition the gallery. ``n_clusters`` defaults to ~sqrt(N).

        ``dtype`` stores partitions compressed: the probe's gather IS the
        search's HBM cost, so ``bf16`` halves and ``int8`` quarters
        per-query traffic (int8 = symmetric /127 quantization of the
        unit-norm descriptors, dequantized in-flight exactly like
        ``knn.score_matrix``'s int8 gallery path; bf16 runs the probe
        einsum at native MXU bf16 rate with f32 accumulation).

        k-means trains on at most ``train_sample`` rows (deterministic
        subsample) — assignment of ALL rows is exact regardless.

        ``balance`` caps every partition at ``ceil(N/C * balance)`` rows
        (greedy capacity-constrained assignment over each row's nearest
        clusters): the padded tensor is what the probe gathers, so
        pad_ratio IS the search's wasted HBM bandwidth — unbalanced
        natural clusters measured 3.55x on 200k synthetic vs capped.
        But every row the cap displaces from its nearest cell is a row
        approximate probes can miss: on a 32-mode 65k corpus, cap 1.3
        cost 6-11 recall@10 pts (0.89/0.94/0.97 at nprobe 4/8/16) where
        natural assignment scored 1.000. Default 2.0 bounds worst-case
        probe traffic at 2x ideal while leaving enough slack that
        moderately skewed corpora spill nothing. ``balance=None`` keeps
        pure nearest-centroid assignment (unbounded pad).
        """
        from image_retrieval_for_image_based_localization_tpu.training.netvlad_init import (
            kmeans,
        )

        g = np.asarray(gallery, np.float32)
        n, d = g.shape
        C = n_clusters or max(1, int(round(np.sqrt(n))))
        train = g
        if n > train_sample:
            sel = np.random.RandomState(seed).choice(
                n, train_sample, replace=False)
            train = g[np.sort(sel)]
        cent, _ = kmeans(jnp.asarray(train), C, iters=kmeans_iters,
                         key=jax.random.PRNGKey(seed))
        cent = np.asarray(cent)
        # per-row nearest clusters (blocked matmul on device); keep the
        # top few so balanced assignment has fallbacks
        n_pref = min(8, C)
        prefs = np.empty((n, n_pref), np.int32)
        cj = jnp.asarray(cent)
        c_sq = jnp.sum(cj * cj, axis=1)[None, :]

        @jax.jit
        def _prefs(x):
            xc = jax.lax.dot_general(
                x, cj, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            _, top = jax.lax.top_k(2.0 * xc - c_sq, n_pref)  # nearest first
            return top

        step = 65536
        for i in range(0, n, step):
            prefs[i : i + step] = np.asarray(_prefs(jnp.asarray(g[i : i + step])))

        if balance is None:
            assign = prefs[:, 0].copy()
        else:
            cap = int(np.ceil(n / C * float(balance)))
            fill = np.zeros(C, np.int64)
            assign = np.full(n, -1, np.int32)
            spill = []
            # deterministic shuffled order so no region of the gallery
            # systematically gets the overflow fallbacks
            order = np.random.RandomState(seed).permutation(n)
            for r in order:
                for c in prefs[r]:
                    if fill[c] < cap:
                        assign[r] = c
                        fill[c] += 1
                        break
                else:
                    spill.append(r)
            if spill:
                # beyond the top-n_pref prefs: nearest centroid that still
                # has space (geometry-aware, unlike argmin(fill) which
                # scatters rows into arbitrary cells probes never visit)
                sp = np.asarray(spill)
                d2 = (
                    -2.0 * g[sp] @ cent.T + np.sum(cent * cent, axis=1)[None]
                )
                for r, dr in zip(sp, np.argsort(d2, axis=1)):
                    for c in dr:
                        if fill[c] < cap:
                            assign[r] = c
                            fill[c] += 1
                            break

        counts = np.bincount(assign, minlength=C)
        L = int(counts.max())
        parts = np.zeros((C, L, d), np.float32)
        ids = np.zeros((C, L), np.int32)
        cursor = np.zeros(C, np.int64)
        order = np.argsort(assign, kind="stable")
        for r in order:
            c = assign[r]
            j = cursor[c]
            parts[c, j] = g[r]
            ids[c, j] = r
            cursor[c] = j + 1
        if dtype == "int8":
            parts = np.clip(np.round(parts * 127.0), -127, 127).astype(
                np.int8)
        return cls(cent, parts, counts.astype(np.int32), ids, n, dtype=dtype)

    # -- search --------------------------------------------------------------

    def _device(self):
        if self._dev is None:
            self._dev = (
                jnp.asarray(self.centroids),
                jnp.asarray(self.partitions),
                jnp.asarray(self.lengths),
                jnp.asarray(self.row_ids),
            )
        return self._dev

    def search(
        self,
        queries: np.ndarray,
        k: int = 10,
        nprobe: int = 8,
        chunk: int = 32,
        gather_budget_bytes: int = 1 << 30,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Approximate top-k: ``(scores [Nq,k], gallery rows [Nq,k])``.

        Ties and ordering inside the probed set match exact search's
        (score desc, row-id asc) contract; rows outside the probed
        partitions are simply absent (that is the approximation).

        The probe gathers ``[chunk, nprobe, L, D]`` f32 — per-QUERY HBM
        traffic is fixed at ``nprobe*L*D*4`` bytes (= ``nprobe/C`` of the
        padded gallery), but the materialized block scales with chunk, so
        chunk is auto-shrunk to keep the block under
        ``gather_budget_bytes`` (default 1 GiB). That also means IVF's
        bandwidth win over exact search (which reads the gallery ONCE per
        query batch) is largest for small query batches — the serving
        case — and shrinks as the batch grows.
        """
        cent, parts, lengths, row_ids = self._device()
        C, L, D = parts.shape
        P = min(nprobe, C)
        k_eff = min(k, P * L)
        itemsize = self.partitions.dtype.itemsize
        chunk = max(
            1, min(chunk, gather_budget_bytes // (P * L * D * itemsize)))
        q = np.atleast_2d(np.asarray(queries, np.float32))
        outs, outi = [], []
        for i in range(0, q.shape[0], chunk):
            s, r = _ivf_search_chunk(
                cent, parts, lengths, row_ids, jnp.asarray(q[i : i + chunk]),
                k=k_eff, nprobe=P,
            )
            outs.append(np.asarray(s))
            outi.append(np.asarray(r))
        from image_retrieval_for_image_based_localization_tpu.retrieval.knn import (
            sanitize_fill_rows,
        )

        s = np.concatenate(outs)
        return s, sanitize_fill_rows(s, np.concatenate(outi))

    # -- persistence ---------------------------------------------------------

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        parts = self.partitions
        if self.dtype == "bf16":  # npz can't serialize ml_dtypes: bit-view
            parts = parts.view(np.uint16)
        np.savez_compressed(
            path, centroids=self.centroids, partitions=parts,
            lengths=self.lengths, row_ids=self.row_ids,
            meta=np.frombuffer(
                json.dumps({"n": self.n, "dtype": self.dtype,
                            "version": 1}).encode(), np.uint8),
        )

    @classmethod
    def load(cls, path: str) -> "IVFIndex":
        if not path.endswith(".npz"):
            path += ".npz"
        z = np.load(path, allow_pickle=False)
        meta = json.loads(bytes(z["meta"]).decode())
        dtype = meta.get("dtype", "f32")
        parts = z["partitions"]
        if dtype == "bf16":
            import ml_dtypes

            parts = parts.view(ml_dtypes.bfloat16)
        return cls(z["centroids"], parts, z["lengths"],
                   z["row_ids"], meta["n"], dtype=dtype)


import functools


@functools.partial(jax.jit, static_argnames=("k", "nprobe"))
def _ivf_search_chunk(cent, parts, lengths, row_ids, q, k: int, nprobe: int):
    """One query chunk: probe + exact-score + top-k, entirely on device.

    The partition gather runs at the STORED dtype (that is the HBM win of
    compressed partitions); dequantization happens on the gathered block
    in VMEM — int8 casts to f32 and rescales /127, bf16 pulls the queries
    down so the einsum runs at native MXU bf16 rate with f32 accumulation.
    """
    # coarse: [nq, C] -> top-nprobe partitions
    cs = jax.lax.dot_general(
        q, cent, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    _, probe = jax.lax.top_k(cs, nprobe)              # [nq, P]
    sub = jnp.take(parts, probe, axis=0)              # [nq, P, L, D] stored dtype
    scale = None
    if parts.dtype == jnp.int8:
        sub = sub.astype(jnp.float32)
        scale = 1.0 / 127.0
    elif parts.dtype != q.dtype:
        q = q.astype(parts.dtype)
    scores = jnp.einsum(
        "qd,qpld->qpl", q, sub, preferred_element_type=jnp.float32)
    if scale is not None:
        scores = scores * scale
    # mask padded rows by partition length
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
        < jnp.take(lengths, probe, axis=0)[:, :, None]
    )
    rows = jnp.take(row_ids, probe, axis=0)           # [nq, P, L]
    scores = jnp.where(valid, scores, NEG_INF)
    # pad slots must not carry a real-looking row id (row_ids pads with 0):
    # sentinel them so an under-filled probe can't emit duplicate row 0
    rows = jnp.where(valid, rows, jnp.iinfo(jnp.int32).max)
    nq = q.shape[0]
    flat_s = scores.reshape(nq, -1)
    flat_r = rows.reshape(nq, -1)
    # exact-search tie contract: score desc, row-id asc. lax.top_k is
    # stable over position, so order candidates by (score, -row) packing:
    # top_k on scores alone breaks ties by flat position, which is probe
    # order, not row order — re-rank the k winners on host-free keys:
    s_top, pos = jax.lax.top_k(flat_s, k)
    r_top = jnp.take_along_axis(flat_r, pos, axis=1)
    # within equal scores prefer the lower row id: sort the k winners by
    # (-score, row) lexicographically via a single composite argsort
    order = jnp.lexsort((r_top, -s_top), axis=1)
    s_top = jnp.take_along_axis(s_top, order, axis=1)
    r_top = jnp.take_along_axis(r_top, order, axis=1)
    return s_top, r_top
