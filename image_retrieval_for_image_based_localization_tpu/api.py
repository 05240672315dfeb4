"""Public API: extract_features / build_index / query.

Mirrors the reference's entry points (BASELINE.json:5; SURVEY.md §3.1 maps
them onto its `test.py` stack): ``extract_features`` is the batched,
multi-scale descriptor extractor; ``build_index`` learns whitening and packs
the gallery; ``query`` is exact top-k search.

The Extractor compiles one XLA program per (bucket shape × scale set) and
reuses it across batches; the multi-scale pyramid runs on-device
(``jax.image.resize``) with the reference's generalized-mean-over-scales
semantics: ``l2n((mean_s d_s^msp)^(1/msp))`` where ``msp`` is GeM's p for
whitening-free GeM models and 1 otherwise (SURVEY.md §7 "multi-scale
semantics").
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from image_retrieval_for_image_based_localization_tpu.models.retrieval_net import (
    RetrievalNet,
)
from image_retrieval_for_image_based_localization_tpu.data.images import make_batches
from image_retrieval_for_image_based_localization_tpu.retrieval.index import Index
from image_retrieval_for_image_based_localization_tpu.utils.config import (
    ExtractConfig,
    IndexConfig,
)

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}

# kill switch for the exact stem channel pad (see Extractor._build_forward);
# tests flip it to pin bitwise padded == unpadded equality
_STEM_PAD_ENABLED = True


def _prefetched(iterator, depth: int = 2):
    """Run an iterator in a background thread, ``depth`` items ahead."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
    SENTINEL = object()

    def worker():
        try:
            for item in iterator:
                q.put(item)
            q.put(SENTINEL)
        except BaseException as e:  # surface decode errors in the consumer
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is SENTINEL:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


class Extractor:
    """Compiled descriptor extraction engine.

    Args:
      variables: flax variables for RetrievalNet (ported or trained). If
        None, randomly initialized (useful for pipeline/perf testing only).
      cfg: ExtractConfig.
      mesh: optional jax Mesh for data-parallel extraction; batches are
        sharded over the mesh's 'data' axis.
    """

    def __init__(
        self,
        cfg: ExtractConfig,
        variables: Optional[Dict[str, Any]] = None,
        rng: int = 0,
        mesh: Optional[jax.sharding.Mesh] = None,
    ):
        import dataclasses as _dc

        mc = cfg.model
        if mesh is not None and "data" in mesh.shape:
            # DP sharding needs the (padded) batch divisible by the data axis
            ddim = mesh.shape["data"]
            bs = -(-cfg.batch_size // ddim) * ddim
            if bs != cfg.batch_size:
                cfg = _dc.replace(cfg, batch_size=bs)
        # R-MAC rides the bucketed path since round 3: the model derives
        # each image's region grid from its valid (h, w) extents
        # (ops.pooling.rmac_bucketed), so padding never enters a region and
        # results match the exact-shape path per image.
        if mc.regional and not cfg.exact:
            # the region grid is a static function of the exact (H, W);
            # bucketed padding has no reference-exact regional analog
            cfg = _dc.replace(cfg, exact=True)
        self.cfg = cfg
        self.model = RetrievalNet(
            arch=mc.arch,
            pooling=mc.pooling,
            regional=mc.regional,
            whiten_dim=mc.whiten_dim,
            netvlad_clusters=mc.netvlad_clusters,
            gem_p=mc.gem_p,
            dtype=_DTYPES[mc.dtype],
            use_pallas=mc.use_pallas,
            # default OFF: measured on hardware (PERF.md round 4) the
            # rewrite is a 2.7% net loss at the production shape — the
            # pack transpose costs more than the K=147->K=192 contraction
            # geometry saves against XLA's small-channel conv emitters.
            # Kept as an opt-in knob for other rigs/shapes.
            s2d_stem=bool(mc.s2d_stem),
        )
        if variables is None:
            h = w = max(64, cfg.bucket_multiple * 2)
            variables = self.model.init(
                jax.random.PRNGKey(rng), jnp.zeros((1, h, w, 3), jnp.float32)
            )
        self.variables = variables
        self.mesh = mesh
        self._structured_fwd = {}  # extract_regional/local jit cache
        self._folded = None
        # None resolves to OFF: the fused trunk measured slower than XLA's
        # conv emitters on hardware (see ExtractConfig.fuse_blocks)
        if cfg.fuse_blocks:
            from image_retrieval_for_image_based_localization_tpu.models.fused_trunk import (
                fold_trunk_variables,
            )

            self._folded = fold_trunk_variables(self.variables, mc.arch)
        self._forward = self._build_forward()

    # -- compiled paths ------------------------------------------------------

    def _build_forward(self):
        model = self.model
        cfg = self.cfg
        scales = tuple(sorted(cfg.scales, reverse=True))

        def msp_value(variables) -> jnp.ndarray:
            if cfg.msp is not None:
                return jnp.asarray(cfg.msp, jnp.float32)
            if getattr(model, "regional", False):
                # cirtorch sets msp=1 whenever meta['regional'] is true:
                # the regional descriptor is a SUM of L2-normalized region
                # vectors, not a raw GeM output — power-mean across scales
                # would be wrong even though the base pool is GeM
                return jnp.asarray(1.0, jnp.float32)
            if (
                model.pooling == "gem"
                and model.whiten_dim is None
                and model.gem_p_trainable
            ):
                return variables["params"]["gem_p"].astype(jnp.float32)
            if model.pooling == "gem" and model.whiten_dim is None:
                return jnp.asarray(model.gem_p, jnp.float32)
            return jnp.asarray(1.0, jnp.float32)

        folded = self._folded
        # regional pooling forces exact-shape extraction (no spatial
        # padding), so the pipeline's mask is trivially full — drop it
        # statically (the regional head rejects masked batches by design)
        regional = getattr(model, "regional", False)

        def single_scale(variables, pixels, mask, scale: float):
            if regional:
                mask = None
            if scale != 1.0:
                B, H, W, C = pixels.shape
                # reference semantics: F.interpolate(scale_factor=s) ->
                # floor(size*s), bilinear half-pixel, NO antialiasing
                nh = max(int(H * scale), 32)
                nw = max(int(W * scale), 32)
                pixels = jax.image.resize(
                    pixels, (B, nh, nw, C), "bilinear", antialias=False
                )
                if mask is not None:
                    mask = (
                        jax.image.resize(
                            mask.astype(jnp.float32), (B, nh, nw), "nearest")
                        >= 0.5
                    )
            if folded is not None:
                from image_retrieval_for_image_based_localization_tpu.models.fused_trunk import (
                    trunk_apply_fused,
                )

                feats = trunk_apply_fused(folded, pixels.astype(model.dtype))
                fmask = None
                if mask is not None:
                    sh = pixels.shape[1] // feats.shape[1]
                    sw = pixels.shape[2] // feats.shape[2]
                    fmask = mask[:, ::sh, ::sw][
                        :, : feats.shape[1], : feats.shape[2]]
                return model.apply(
                    variables, feats, mask=fmask, precomputed_features=True
                )
            return model.apply(variables, pixels, mask=mask)

        # stem channel pad (round-5, measured +0.7% end-to-end at b128
        # @1024): a 3-channel conv input forces XLA into a separate layout
        # copy (copy.18, 3.0 ms/iter in the trace); presenting the input as
        # C=4 with a zero-padded stem kernel is EXACTLY the same math (f32
        # sums over appended zeros are bitwise unchanged) and lets the pad
        # fuse into the on-device normalize. ResNet stems only (the s2d
        # rewrite and the folded trunk assume C=3), and only when the
        # checkpoint kernel still has 3 input channels.
        stem_pad = (
            _STEM_PAD_ENABLED
            and model.arch.startswith("resnet")
            and not getattr(model, "s2d_stem", False)
            and folded is None
        )

        def _pad_stem(variables, pixels):
            try:
                k = variables["params"]["trunk"]["stem"]["conv"]["kernel"]
            except (KeyError, TypeError):
                return variables, pixels
            if k.shape[2] != 3:
                return variables, pixels
            params = dict(variables["params"])
            trunk = dict(params["trunk"])
            stem = dict(trunk["stem"])
            conv = dict(stem["conv"])
            conv["kernel"] = jnp.pad(k, ((0, 0), (0, 0), (0, 1), (0, 0)))
            stem["conv"] = conv
            trunk["stem"] = stem
            params["trunk"] = trunk
            variables = dict(variables)
            variables["params"] = params
            pixels = jnp.pad(pixels, ((0, 0), (0, 0), (0, 0), (0, 1)))
            return variables, pixels

        def forward(variables, pixels, mask):
            if stem_pad and pixels.shape[-1] == 3:
                variables, pixels = _pad_stem(variables, pixels)
            if len(scales) == 1:
                return single_scale(variables, pixels, mask, scales[0])
            msp = msp_value(variables)
            # GeM descriptors are non-negative pre-whitening so the power is
            # well-defined; msp=1 models (whitened / non-GeM) take the
            # identity branch, preserving negative components.
            acc = None
            for s in scales:
                d = single_scale(variables, pixels, mask, s)
                d = jnp.where(msp == 1.0, d, jnp.power(jnp.clip(d, min=0.0), msp))
                acc = d if acc is None else acc + d
            acc = acc / len(scales)
            acc = jnp.where(
                msp == 1.0, acc, jnp.power(jnp.clip(acc, min=0.0), 1.0 / msp)
            )
            norm = jnp.sqrt(jnp.sum(jnp.square(acc), axis=-1, keepdims=True))
            return acc / (norm + 1e-6)

        # uint8 entry: pixels arrive as raw uint8 with per-row (h, w) valid
        # extents; normalization, mask construction, and padding-zeroing run
        # on device (5x less host->device transfer than f32 + bool mask)
        from image_retrieval_for_image_based_localization_tpu.data.images import (
            IMAGENET_MEAN,
            IMAGENET_STD,
        )

        # normalize straight into the model's compute dtype as one fused
        # scale-and-shift: u8 -> dt -> x*a + b with a = 1/(255 std),
        # b = -mean/std (f32-computed constants, rounded once). In f32 this
        # is algebraically the reference normalize; in bf16 it removes the
        # [B,H,W,3] f32 intermediate + separate bf16 convert the trace
        # bills at ~6.6 ms/iter (PERF.md round-4 stem chain) — the rounding
        # step (~0.01 at |x|<=2.7) sits well under the uint8 quantization
        # step itself (1/(255 std) ~ 0.017-0.019).
        dt = _DTYPES[self.cfg.model.dtype]
        nrm_a = jnp.asarray(
            1.0 / (255.0 * np.asarray(IMAGENET_STD, np.float64)), dt)
        nrm_b = jnp.asarray(
            -np.asarray(IMAGENET_MEAN, np.float64)
            / np.asarray(IMAGENET_STD, np.float64), dt)

        def forward_u8(variables, pixels_u8, sizes):
            B, H, W, _ = pixels_u8.shape
            row = jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 1)
            col = jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 2)
            mask = (row < sizes[:, 0, None, None]) & (col < sizes[:, 1, None, None])
            x = pixels_u8.astype(dt) * nrm_a + nrm_b
            x = x * mask[..., None]  # legacy zero-padding in normalized space
            return forward(variables, x, mask)

        from image_retrieval_for_image_based_localization_tpu.utils.tuning import (
            tpu_compiler_options,
        )

        copts = tpu_compiler_options()
        # raw (un-jitted) closure for callers composing larger programs
        # (e.g. serving's one-hop extract+query): a jit carrying
        # compiler_options cannot be nested inside another jit
        self._forward_u8_fn = forward_u8
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            data_sharding = NamedSharding(self.mesh, P("data"))
            rep = NamedSharding(self.mesh, P())
            self._forward_u8 = jax.jit(
                forward_u8,
                in_shardings=(rep, data_sharding, data_sharding),
                out_shardings=data_sharding,
                compiler_options=copts,
            )
            return jax.jit(
                forward,
                in_shardings=(rep, data_sharding, data_sharding),
                out_shardings=data_sharding,
                compiler_options=copts,
            )
        self._forward_u8 = jax.jit(forward_u8, compiler_options=copts)
        return jax.jit(forward, compiler_options=copts)

    # -- user-facing ---------------------------------------------------------

    @property
    def out_dim(self) -> int:
        return self.model.out_dim

    def __call__(self, pixels: np.ndarray, mask: Optional[np.ndarray] = None) -> np.ndarray:
        """Extract descriptors from an already-batched NHWC float array."""
        pixels = jnp.asarray(pixels)
        if mask is None:
            mask_j = jnp.ones(pixels.shape[:3], dtype=bool)
        else:
            mask_j = jnp.asarray(mask)
        return np.asarray(self._forward(self.variables, pixels, mask_j))

    def make_input_batches(self, images: Sequence, bbxs=None,
                           batch_size: Optional[int] = None):
        """The production host-preprocessing pipeline for ``images`` (paths
        or HWC arrays): native C++ decode/resize when available and
        applicable, PIL otherwise — ONE place decides, so every consumer
        (extract, serving's one-hop endpoint) produces identical pixels
        for the same input. ``batch_size`` overrides the config's (the
        one-hop path wants 1 — a padded 16-row batch would 16x the trunk
        work of a single query)."""
        cfg = self.cfg
        bs = batch_size or cfg.batch_size
        use_native = (
            cfg.native_preproc is not False
            and not cfg.squarify
            and len(images) > 0
            and all(isinstance(im, str) for im in images)
        )
        if use_native:
            from image_retrieval_for_image_based_localization_tpu.data.native import (
                native_available,
            )

            use_native = native_available() or cfg.native_preproc is True
        bucket_multiple = 1 if cfg.exact else cfg.bucket_multiple
        if use_native:
            from image_retrieval_for_image_based_localization_tpu.data.images import (
                make_batches_native,
            )

            return make_batches_native(
                images,
                image_size=cfg.image_size,
                batch_size=bs,
                bucket_multiple=bucket_multiple,
                bbxs=bbxs,
                upscale=cfg.upscale,
                resize_filter=cfg.resize_filter,
            )
        return make_batches(
            images,
            image_size=cfg.image_size,
            batch_size=bs,
            bucket_multiple=bucket_multiple,
            bbxs=bbxs,
            squarify=cfg.squarify,
            upscale=cfg.upscale,
            resize_filter=cfg.resize_filter,
        )

    def extract(
        self,
        images: Sequence,
        bbxs: Optional[Sequence] = None,
        progress: bool = False,
        prefetch: int = 2,
    ) -> np.ndarray:
        """Extract descriptors for a list of image paths or HWC arrays.

        Host preprocessing (decode/resize/pad) runs in a background thread
        ``prefetch`` batches ahead so the device never waits on PIL
        (BASELINE.json:5: "preprocessing overlapped with device compute").
        """
        out = np.zeros((len(images), self.out_dim), dtype=np.float32)
        batches = self.make_input_batches(images, bbxs=bbxs)
        # NOTE: uploading from the prefetch thread (device_put inside the
        # producer) was measured 3x SLOWER through this rig's relay client
        # (thread contention); uploads stay on the main thread.
        pending = []  # (device descs future, host indices) — drain lazily
        for batch in _prefetched(batches, prefetch):
            descs = self._forward_u8(
                self.variables,
                jnp.asarray(batch.pixels_u8),
                jnp.asarray(batch.sizes),
            )
            pending.append((descs, batch.indices))
            # drain all-but-last so dispatch stays ahead of the host
            while len(pending) > prefetch:
                d, ix = pending.pop(0)
                out[ix] = np.asarray(d)[: len(ix)]
                if progress:
                    print(f"extracted {ix[-1] + 1}/{len(images)}", flush=True)
        for d, ix in pending:
            out[ix] = np.asarray(d)[: len(ix)]
        return out

    def _extract_structured(self, images, bbxs, kind: str):
        """Shared driver for the non-aggregated extraction APIs: exact
        shapes (region grids / feature maps are shape-dependent), one jit
        program per distinct image shape, cached across calls; per-image
        outputs as a list. Multi-scale configs run every scale (reference
        extract semantics: floor-sized, non-antialiased bilinear resize)
        and CONCATENATE the per-scale vectors along the vector axis — the
        standard shape for local-aggregation consumers.
        """
        from image_retrieval_for_image_based_localization_tpu.data.images import (
            IMAGENET_MEAN,
            IMAGENET_STD,
        )

        cfg = self.cfg
        fwd = self._structured_fwd.get(kind)
        if fwd is None:
            mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
            std = jnp.asarray(IMAGENET_STD, jnp.float32)
            model = self.model
            scales = tuple(sorted(cfg.scales, reverse=True))
            apply_kwargs = {"return_regions": True} if kind == "regions" \
                else {"return_features": True}

            @jax.jit
            def fwd(variables, pixels_u8):
                x = pixels_u8.astype(jnp.float32) / 255.0
                x = (x - mean) / std
                outs = []
                for s in scales:
                    xs = x
                    if s != 1.0:
                        B, H, W, C = x.shape
                        nh, nw = max(int(H * s), 32), max(int(W * s), 32)
                        xs = jax.image.resize(
                            x, (B, nh, nw, C), "bilinear", antialias=False)
                    r = model.apply(variables, xs, **apply_kwargs)
                    if kind == "features":  # [B, h, w, C] -> [B, P, C]
                        r = r.reshape(r.shape[0], -1, r.shape[-1])
                    outs.append(r)
                return jnp.concatenate(outs, axis=1)

            self._structured_fwd[kind] = fwd

        out: list = [None] * len(images)
        for batch in make_batches(
            images, image_size=cfg.image_size, batch_size=cfg.batch_size,
            bucket_multiple=1, bbxs=bbxs, squarify=cfg.squarify,
            upscale=cfg.upscale, resize_filter=cfg.resize_filter,
        ):
            res = np.asarray(fwd(self.variables, jnp.asarray(batch.pixels_u8)))
            for row, ix in enumerate(batch.indices):
                out[ix] = res[row]
        return out

    def extract_regional(self, images: Sequence, bbxs=None) -> list:
        """Per-image PER-REGION descriptors (cirtorch
        ``extract_regional_vectors``): a list of ``[R_i, D]`` arrays — each
        region base-pooled, L2-normalized, and whitened (when the model has
        a whiten FC), NOT summed. Requires a regional model. R_i depends on
        each image's exact aspect (the R-MAC grid) and, for multi-scale
        configs, sums region counts over the scales."""
        if not self.model.regional:
            raise ValueError("extract_regional requires ModelConfig("
                             "regional=True)")
        return self._extract_structured(images, bbxs, "regions")

    def extract_local(self, images: Sequence, bbxs=None) -> list:
        """Per-image LOCAL features (cirtorch ``extract_local_vectors``): a
        list of ``[P_i, C]`` arrays — every trunk spatial position's
        activation, L2-normalized over channels (positions flattened like
        the reference; multi-scale configs concatenate positions across
        scales). Input to local-aggregation pipelines (ASMK-style)."""
        return self._extract_structured(images, bbxs, "features")

    def extract_resumable(
        self,
        images: Sequence,
        cache_dir: str,
        bbxs: Optional[Sequence] = None,
        shard_size: int = 1024,
    ) -> np.ndarray:
        """Extraction with per-shard on-disk checkpoints (SURVEY.md §5
        failure recovery): a preempted index build resumes from the last
        completed shard instead of restarting.
        """
        import os

        os.makedirs(cache_dir, exist_ok=True)
        n = len(images)
        parts = []
        for s in range(0, n, shard_size):
            shard_path = os.path.join(cache_dir, f"descs_{s:08d}.npy")
            if os.path.exists(shard_path):
                parts.append(np.load(shard_path))
                continue
            sel = slice(s, min(s + shard_size, n))
            d = self.extract(
                images[sel], bbxs=None if bbxs is None else bbxs[sel]
            )
            tmp = shard_path + ".tmp"
            with open(tmp, "wb") as f:
                np.save(f, d)
            os.replace(tmp, shard_path)  # atomic: no torn shards on preempt
            parts.append(d)
        return np.concatenate(parts, axis=0)


def extract_features(
    images: Sequence,
    cfg: ExtractConfig = ExtractConfig(),
    variables: Optional[Dict[str, Any]] = None,
    bbxs: Optional[Sequence] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> np.ndarray:
    """Extract [N, D] descriptors for images (paths or HWC arrays)."""
    return Extractor(cfg, variables=variables, mesh=mesh).extract(images, bbxs=bbxs)


def extract_vectors(
    net_or_variables,
    images: Sequence,
    image_size: int = 1024,
    ms: Sequence[float] = (1.0,),
    bbxs: Optional[Sequence] = None,
    cfg: Optional[ExtractConfig] = None,
) -> np.ndarray:
    """Reference-style alias (`extract_vectors(net, images, image_size, ms=...)`,
    SURVEY.md §3.1). Accepts an Extractor, or flax variables + cfg. Returns
    [N, D] (the reference returns D x N — transpose if porting eval code).
    """
    if isinstance(net_or_variables, Extractor):
        ex = net_or_variables
    else:
        base = cfg or ExtractConfig()
        import dataclasses as _dc

        base = _dc.replace(base, image_size=image_size, scales=tuple(ms))
        ex = Extractor(base, variables=net_or_variables)
    return ex.extract(images, bbxs=bbxs)


def build_index(
    descriptors: np.ndarray,
    cfg: IndexConfig = IndexConfig(),
    ids: Optional[Sequence] = None,
    pairs: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    whitening_mP: Optional[Tuple[np.ndarray, np.ndarray]] = None,
) -> Index:
    """Build an exact-search index. Whitening is learned on the gallery, or
    applied from pre-learned ``whitening_mP=(m, P)`` (reference test-time
    semantics: train-data whitening loaded at eval)."""
    return Index.build(
        descriptors, cfg=cfg, ids=ids, pairs=pairs, whitening_mP=whitening_mP
    )


def query(
    index: Index, qdescriptors: np.ndarray, k: int = 10
) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k search against an index. Returns (scores, indices)."""
    return index.query(qdescriptors, k=k)
