"""The descriptor Index: whitening + gallery + exact search + persistence.

Mirrors the reference's index-build phase (extract db vectors → learn/apply
whitening → keep the matrix for brute-force scoring, SURVEY.md §3.1), made a
first-class checkpointed artifact (SURVEY.md §5 "Checkpoint/resume"): the
gallery matrix, whitening ``(m, P)``, and the image-id list save/load as one
unit (compressed npz — memory-mappable and dependency-free).

Search is exact: single-device streaming top-k (``retrieval.knn``) or, when
given a mesh, the multi-chip sharded gallery (``parallel.sharded_index``).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from image_retrieval_for_image_based_localization_tpu.ops.whitening import (
    pca_whiten_learn,
    whiten_learn,
    whiten_apply,
)
from image_retrieval_for_image_based_localization_tpu.retrieval.knn import (
    approx_topk,
    auto_chunk,
    blockmax_topk,
    knn_search,
    full_ranks,
    score_matrix,
)
from image_retrieval_for_image_based_localization_tpu.utils.config import IndexConfig

import functools

import jax


@functools.partial(jax.jit, static_argnames=("k", "dims"))
def _fused_query_whitened(gallery, q, m, P, k, dims):
    """Whiten + score + exact top-k as ONE device program.

    The serving concurrency-1 path: eagerly chaining transform_queries
    (own dispatch + a device->host->device descriptor bounce) and the
    selection ops pays one relay round trip per op through this rig's
    tunnel; a single jitted program pays one H2D (the tiny query), one
    dispatch, one D2H. Math identical to transform_queries + knn_search's
    single-chunk path: same whiten_apply, same score_matrix, same stable
    blockmax selection.
    """
    return blockmax_topk(
        score_matrix(gallery, whiten_apply(q, m, P, dims)), k)


@functools.partial(jax.jit, static_argnames=("k",))
def _fused_query_plain(gallery, q, k):
    return blockmax_topk(score_matrix(gallery, q), k)


# transform_queries feeds the IVF/PQ serving paths, which are themselves
# single-dispatch jits — jit the whitening too so the pre-transform isn't
# the one remaining eager per-op chain (4 relay round trips) per request
_whiten_apply_jit = functools.partial(jax.jit, static_argnames=("dims",))(
    whiten_apply)


@dataclasses.dataclass
class Index:
    """Exact-search descriptor index.

    ``storage`` controls the on-device gallery dtype: 'float32' (bitwise
    ranking parity), 'bfloat16' (2x memory — measured recall@10 = 1.000 at
    100k x 2048 on TPU; the recommended compression), or 'int8' (4x memory,
    symmetric /127 quantization of the unit-norm rows; measured recall@10 =
    0.83 on worst-case iid-random 2048-d vectors whose neighbor score gaps
    are at quantization noise level — real descriptor galleries have much
    larger gaps, but verify recall on your data before choosing int8).
    Scores returned are always f32 and, for int8, rescaled to cosine range.
    """

    gallery: np.ndarray                 # [N, D'] whitened, L2-normalized
    m: Optional[np.ndarray] = None      # whitening mean [D]
    P: Optional[np.ndarray] = None      # whitening projection [D', D]
    dims: Optional[int] = None
    ids: Optional[np.ndarray] = None    # image identifiers (or indices)
    storage: str = "float32"
    _device_gallery: Optional[jnp.ndarray] = dataclasses.field(
        default=None, repr=False, compare=False
    )
    _device_mP: Optional[Tuple] = dataclasses.field(
        default=None, repr=False, compare=False
    )

    def device_gallery(self) -> jnp.ndarray:
        """Device-resident gallery, uploaded once and cached (serving path:
        re-uploading a multi-GB gallery per query would dominate latency).
        Stored in the configured ``storage`` dtype."""
        if self._device_gallery is None or (
            self._device_gallery.shape != self.gallery.shape
        ):
            g = self.gallery
            if self.storage == "bfloat16":
                self._device_gallery = jnp.asarray(g, jnp.bfloat16)
            elif self.storage == "int8":
                q = np.clip(np.round(np.asarray(g, np.float32) * 127.0), -127, 127)
                self._device_gallery = jnp.asarray(q, jnp.int8)
            elif self.storage == "float32":
                self._device_gallery = jnp.asarray(g, jnp.float32)
            else:
                raise ValueError(f"unknown storage {self.storage!r}")
        return self._device_gallery

    @classmethod
    def build(
        cls,
        descriptors: np.ndarray,
        cfg: IndexConfig = IndexConfig(),
        ids: Optional[Sequence] = None,
        pairs: Optional[Tuple[np.ndarray, np.ndarray]] = None,
        whitening_mP: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    ) -> "Index":
        """Learn whitening on the gallery descriptors and build the index.

        ``pairs=(qidxs, pidxs)`` enables supervised Lw whitening.
        ``whitening_mP=(m, P)`` applies a PRE-LEARNED whitening instead of
        learning from this gallery — the reference's semantics when loading
        train-data whitening at test time (cirtorch `--whitening
        retrieval-SfM-120k`; e.g. the ``whitening.npz`` the training loop
        saves).
        """
        descriptors = np.asarray(descriptors, dtype=np.float32)
        m = P = None
        if whitening_mP is not None:
            m = np.asarray(whitening_mP[0], np.float32)
            P = np.asarray(whitening_mP[1], np.float32)
        learn_set = descriptors
        if (
            whitening_mP is None
            and cfg.whitening is not None
            and cfg.whiten_sample
            and descriptors.shape[0] > cfg.whiten_sample
        ):
            sel = np.random.RandomState(0).choice(
                descriptors.shape[0], cfg.whiten_sample, replace=False
            )
            learn_set = descriptors[np.sort(sel)]
        if whitening_mP is not None:
            pass  # precomputed; nothing to learn
        elif cfg.whitening == "pca":
            m, P = pca_whiten_learn(
                learn_set, shrinkage=cfg.shrinkage, strict=cfg.strict_whitening
            )
        elif cfg.whitening == "lw":
            if pairs is None:
                raise ValueError("Lw whitening requires pairs=(qidxs, pidxs)")
            m, P = whiten_learn(descriptors, pairs[0], pairs[1])
        elif cfg.whitening is not None:
            raise ValueError(f"unknown whitening {cfg.whitening!r}")

        gallery = descriptors
        if P is not None:
            # apply whitening on device in row blocks (1M x 2048 galleries
            # must not round-trip as one array)
            import jax

            mj = jnp.asarray(m, jnp.float32)
            Pj = jnp.asarray(P, jnp.float32)
            apply_fn = jax.jit(
                lambda x: whiten_apply(x, mj, Pj, cfg.whiten_dims)
            )
            blocks = []
            step = 65536
            for i in range(0, descriptors.shape[0], step):
                blocks.append(
                    np.asarray(apply_fn(jnp.asarray(descriptors[i : i + step])))
                )
            gallery = (
                np.concatenate(blocks, axis=0) if len(blocks) > 1 else blocks[0]
            )
        if cfg.dba_nqe:
            # database-side augmentation: gallery->gallery alphaQE in the
            # final search space (post-whitening). Each row's top-1
            # neighbor is itself (s=1), so self carries weight 1 + 1 from
            # the explicit q term — the standard DBA self-inclusion.
            from image_retrieval_for_image_based_localization_tpu.retrieval.query_expansion import (
                expand_queries,
            )

            gdev = jnp.asarray(gallery)
            nqe = min(int(cfg.dba_nqe), gallery.shape[0])
            blocks = []
            step = 8192  # bound the [step, nqe, D] gather + scores
            for i in range(0, gallery.shape[0], step):
                blocks.append(np.asarray(expand_queries(
                    gdev, gdev[i : i + step], nqe=nqe, alpha=cfg.dba_alpha
                )))
            gallery = (
                np.concatenate(blocks, axis=0) if len(blocks) > 1 else blocks[0]
            )
        return cls(
            gallery=gallery,
            m=None if m is None else np.asarray(m, np.float32),
            P=None if P is None else np.asarray(P, np.float32),
            dims=cfg.whiten_dims,
            ids=None if ids is None else np.asarray(ids),
            storage=cfg.storage,
        )

    def transform_queries(self, qdescriptors: np.ndarray) -> np.ndarray:
        """Apply the index's whitening to query descriptors."""
        q = np.asarray(qdescriptors, dtype=np.float32)
        if self.P is None:
            return q
        if self._device_mP is None:
            self._device_mP = (jnp.asarray(self.m), jnp.asarray(self.P))
        return np.asarray(
            _whiten_apply_jit(jnp.asarray(q), *self._device_mP,
                              dims=self.dims),
            dtype=np.float32,
        )

    def _search_queries(self, qdescriptors, qe_nqe: int, qe_alpha: float):
        """Whitened (and optionally αQE-expanded) queries, device-resident."""
        q = jnp.asarray(self.transform_queries(qdescriptors))
        if qe_nqe:
            from image_retrieval_for_image_based_localization_tpu.retrieval.query_expansion import (
                expand_queries,
            )

            q = expand_queries(
                self.device_gallery(), q,
                nqe=min(int(qe_nqe), self.gallery.shape[0]), alpha=qe_alpha,
            )
        return q

    def query(
        self,
        qdescriptors: np.ndarray,
        k: int = 10,
        qe_nqe: int = 0,
        qe_alpha: float = 3.0,
        method: str = "exact",
        recall_target: float = 0.95,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k search. Returns (scores [Nq,k], indices [Nq,k]).

        ``qe_nqe > 0`` enables αQE re-querying (``retrieval.
        query_expansion``): one extra nQE search + on-device expansion
        before the main ranking pass.

        ``method``: ``"exact"`` (stable-tie streaming top-k, the default
        and the reference-parity path) or ``"approx"`` (full-precision MXU
        scoring with TPU hardware approximate selection via
        ``lax.approx_max_k`` at ``recall_target`` — see
        ``retrieval.knn.approx_topk``; no stable-tie contract).
        """
        if method == "exact" and not qe_nqe:
            q_np = np.atleast_2d(np.asarray(qdescriptors, np.float32))
            Ng = self.gallery.shape[0]
            # the fused path exists for small serving batches; its pad
            # bucket can double Nq, so gate on the PADDED count and cap it
            # (a large one-off eval batch takes the staged/streaming path,
            # which never materializes more than its chunk budget)
            nq_bucket = 1 << (max(q_np.shape[0], 1) - 1).bit_length()
            if nq_bucket <= 1024 and auto_chunk(Ng, nq_bucket) >= Ng:
                # single-dispatch fast path (serving concurrency-1): one
                # program does whiten + score + select — identical results
                # to the staged path (same single-chunk scoring + stable
                # blockmax), minus the per-stage relay round trips
                g = self.device_gallery()
                kk = min(k, Ng)
                # pad Nq to the next power of two: one compile per bucket
                # instead of per request batch size (pad rows are computed
                # and discarded; row-wise ops keep real rows unchanged)
                nq = q_np.shape[0]
                bucket = 1 << (nq - 1).bit_length()
                if bucket != nq:
                    q_np = np.pad(q_np, ((0, bucket - nq), (0, 0)))
                if self.P is not None:
                    if self._device_mP is None:
                        self._device_mP = (jnp.asarray(self.m),
                                           jnp.asarray(self.P))
                    scores, idx = _fused_query_whitened(
                        g, jnp.asarray(q_np), *self._device_mP,
                        k=kk, dims=self.dims)
                else:
                    scores, idx = _fused_query_plain(
                        g, jnp.asarray(q_np), k=kk)
                return np.asarray(scores)[:nq], np.asarray(idx)[:nq]
        q = self._search_queries(qdescriptors, qe_nqe, qe_alpha)
        if method == "approx":
            scores, idx = approx_topk(
                self.device_gallery(), q, k=k, recall_target=recall_target)
        elif method == "exact":
            scores, idx = knn_search(self.device_gallery(), q, k=k)
        else:
            raise ValueError(f"unknown query method {method!r} (exact|approx)")
        return np.asarray(scores), np.asarray(idx)

    def ranks(
        self,
        qdescriptors: np.ndarray,
        qe_nqe: int = 0,
        qe_alpha: float = 3.0,
    ) -> np.ndarray:
        """Full ranking [N, Nq] for mAP evaluation."""
        q = self._search_queries(qdescriptors, qe_nqe, qe_alpha)
        return full_ranks(self.device_gallery(), q)

    def diffusion_ranks(
        self,
        qdescriptors: np.ndarray,
        k_graph: int = 50,
        k_seed: int = 10,
        gamma: float = 3.0,
        alpha: float = 0.9,
        iters: int = 30,
        qe_nqe: int = 0,
        qe_alpha: float = 3.0,
    ) -> np.ndarray:
        """Full ranking [N, Nq] by kNN-graph diffusion re-ranking
        (``retrieval.diffusion``; composes with αQE on the seeds' search).

        Rows the diffusion never reaches (different connected component)
        fall back to their plain cosine order *below* every reached row.
        """
        from image_retrieval_for_image_based_localization_tpu.retrieval.diffusion import (
            build_graph,
            diffusion_scores,
        )

        q = self._search_queries(qdescriptors, qe_nqe, qe_alpha)
        gdev = self.device_gallery()
        # the graph is query-independent and expensive (~24 s at 20k rows,
        # PERF.md) — cache it per (k_graph, gamma) so repeated calls (the
        # serving case, which holds the device lock meanwhile) pay it once
        key = (int(k_graph), float(gamma))
        if getattr(self, "_diffusion_cache", None) is None:
            self._diffusion_cache = {}
        graph = self._diffusion_cache.get(key)
        if graph is None:
            graph = build_graph(gdev, k=k_graph, gamma=gamma)
            self._diffusion_cache[key] = graph
        f = diffusion_scores(
            gdev, q, graph=graph, k_graph=k_graph, k_seed=k_seed,
            gamma=gamma, alpha=alpha, iters=iters,
        )
        # score_matrix dequantizes int8 storage to cosine range — a raw
        # cast here would put unreached rows at ~127x and invert the
        # reached-above-unreached ordering below
        cos = np.asarray(score_matrix(gdev, q)).T  # [N, Nq]
        # any diffused row outranks any unreached one (cos <= 1 < 3);
        # ordering within each group is preserved
        final = np.where(f > 0, 3.0 + f, cos)
        return np.argsort(-final, axis=0, kind="stable")

    # -- persistence ---------------------------------------------------------

    def save(self, path: str, external_gallery: bool = False) -> None:
        """Persist the index.

        ``external_gallery=True`` writes the gallery as an UNCOMPRESSED
        sidecar ``<path>.gallery.npy`` (atomic rename) and only the small
        whitening/meta arrays into the npz — the config-5 shape (1M x 2048
        f32 = 8 GB): compressing random-ish floats buys little, and the
        sidecar loads back memory-mapped, so process RSS stays at the
        working set while the device upload streams straight from the
        page cache.
        """
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        meta = {"dims": self.dims, "version": 1, "storage": self.storage}
        arrays = dict(
            m=np.zeros(0) if self.m is None else self.m,
            P=np.zeros((0, 0)) if self.P is None else self.P,
            ids=np.zeros(0) if self.ids is None else self.ids,
        )
        # the npy format only round-trips NATIVE numpy dtypes: an ml_dtypes
        # bfloat16 gallery (the config-5 host representation) silently
        # degrades to void16 ("|V2") on np.save and is unloadable. Persist
        # such galleries as a same-width unsigned bit-view and record the
        # real dtype in meta so load can view it back losslessly.
        gallery = np.asarray(self.gallery)
        if gallery.dtype.kind == "V" or gallery.dtype.name not in (
                "float32", "float16", "float64", "int8"):
            meta["gallery_dtype"] = gallery.dtype.name  # e.g. 'bfloat16'
            # .view() needs a contiguous last axis (sliced/transposed
            # galleries would raise), and the bit-view map must cover every
            # itemsize that can reach here (int64 ids-as-gallery, f64)
            gallery = np.ascontiguousarray(gallery).view(
                {1: np.uint8, 2: np.uint16, 4: np.uint32,
                 8: np.uint64}[gallery.dtype.itemsize])
        if external_gallery:
            gpath = path.removesuffix(".npz") + ".gallery.npy"
            meta["external_gallery"] = os.path.basename(gpath)
            tmp = gpath + ".tmp"
            with open(tmp, "wb") as f:  # file handle: np.save won't
                np.save(f, gallery)  # append another .npy suffix
            os.replace(tmp, gpath)
        else:
            arrays["gallery"] = gallery
        np.savez_compressed(
            path,
            meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
            **arrays,
        )

    @classmethod
    def load(cls, path: str) -> "Index":
        if not path.endswith(".npz"):
            path = path + ".npz"
        z = np.load(path, allow_pickle=False)
        meta = json.loads(bytes(z["meta"]).decode())
        m = z["m"] if z["m"].size else None
        P = z["P"] if z["P"].size else None
        ids = z["ids"] if z["ids"].size else None
        if meta.get("external_gallery"):
            gpath = os.path.join(os.path.dirname(os.path.abspath(path)),
                                 meta["external_gallery"])
            gallery = np.load(gpath, mmap_mode="r")
        else:
            gallery = z["gallery"]
        if meta.get("gallery_dtype"):
            import ml_dtypes  # bit-view back to the real dtype (see save)

            gallery = gallery.view(np.dtype(meta["gallery_dtype"]))
        return cls(
            gallery=gallery, m=m, P=P, dims=meta.get("dims"), ids=ids,
            storage=meta.get("storage", "float32"),
        )
