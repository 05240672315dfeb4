"""Typed configuration system.

The reference configures via argparse flags with model hyperparameters
serialized into a checkpoint ``meta`` dict (SURVEY.md §2 "Config system";
reference mount empty). Here: frozen dataclasses, plus the five graded
benchmark configs from BASELINE.json:6-12 as the shipped config matrix.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

# Multi-scale pyramid used by the reference lineage: [1, 1/sqrt(2), 1/2]
DEFAULT_SCALES: Tuple[float, ...] = (1.0, 2 ** -0.5, 0.5)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    arch: str = "resnet50"
    pooling: str = "gem"
    regional: bool = False  # cirtorch Rpool: base pool per R-MAC region
    whiten_dim: Optional[int] = None  # learned FC whitening inside the model
    netvlad_clusters: int = 64
    gem_p: float = 3.0
    dtype: str = "float32"  # 'float32' | 'bfloat16' (compute dtype)
    use_pallas: bool = False
    # space-to-depth stem rewrite for resnets (exact; same parameters —
    # see models.resnet._S2DConv7x7s2). Opt-in: measured a 2.7% net LOSS
    # at the production shape on this rig (PERF.md round 4) — XLA's
    # specialized small-channel conv emitters beat the extra pack
    # transpose. None == off.
    s2d_stem: Optional[bool] = None


@dataclasses.dataclass(frozen=True)
class ExtractConfig:
    model: ModelConfig = ModelConfig()
    image_size: int = 1024          # max-side resize target
    scales: Tuple[float, ...] = (1.0,)
    batch_size: int = 16
    # multi-scale power: None -> GeM p when pooling is gem without whitening,
    # else 1 (reference semantics, SURVEY.md §7 "multi-scale semantics")
    msp: Optional[float] = None
    bucket_multiple: int = 32       # pad H/W up to multiples of this (stride)
    squarify: bool = False          # True: resize to square (fast path)
    # exact-shape mode: no spatial padding — each image runs at its true
    # resized shape (bucket_multiple forced to 1; same-shape images still
    # batch). The reference runs bs=1 exact shapes; use this to measure the
    # bucketed-vs-exact delta or for strict parity runs. Costs one XLA
    # compilation per distinct shape.
    exact: bool = False
    # None = auto (use the C++ decode/resize library when built and inputs
    # are paths); True forces it; False forces the PIL path
    native_preproc: Optional[bool] = None
    # reference parity (defaults): cirtorch's imresize thumbnails — it only
    # SHRINKS to image_size and uses the antialiased LANCZOS filter.
    # upscale=True also grows small images (sometimes better batching);
    # resize_filter='bilinear' restores the round-1 behavior.
    upscale: bool = False
    resize_filter: str = "lanczos"  # 'lanczos' (reference) | 'bilinear'
    # EXPERIMENTAL inference-fused trunk (ops.pallas.bottleneck_block):
    # stride-1 bottleneck blocks as VMEM-resident Pallas kernels with BN
    # folded — ~2x less early-stage HBM traffic. Measured on this rig it
    # LOSES to XLA's small-channel conv emitters end-to-end (330 vs 480
    # img/s at b128/1024px, resnet50 bf16 — per-tile overheads + 64-lane
    # ops; PERF.md "Fused bottleneck kernel"), so None resolves to OFF;
    # set True to opt in (descriptors agree to bf16 noise, cosine
    # >= 0.999999 on hardware; masks compose). Inference only.
    fuse_blocks: Optional[bool] = None


@dataclasses.dataclass(frozen=True)
class IndexConfig:
    whitening: Optional[str] = "pca"  # 'pca' | 'lw' | None
    whiten_dims: Optional[int] = None  # truncate to this many dims
    shrinkage: float = 0.0
    # strict-reference PCA whitening: never auto-engage shrinkage or the
    # eigenvalue floor (see ops.whitening.pca_whiten_learn) — parity runs
    # against ported reference whitening must not be confounded silently
    strict_whitening: bool = False
    # learn whitening on at most this many (deterministically sampled) rows;
    # applied to all. Host-side eig over >>100k rows adds nothing
    # statistically and this host has 1 CPU core.
    whiten_sample: Optional[int] = 200_000
    # device gallery dtype: 'float32' (bitwise ranking parity) | 'bfloat16'
    # (2x memory, measured recall@10 = 1.0) | 'int8' (4x memory; verify
    # recall on your data - 0.83 on worst-case iid-random vectors)
    storage: str = "float32"
    # database-side augmentation (DBA): at build time replace each gallery
    # descriptor with the re-l2n weighted sum of itself and its top-nqe
    # gallery neighbors (same alphaQE math, applied gallery->gallery).
    # 0 = off. Beyond-reference mAP booster; build cost = one extra
    # gallery x gallery search.
    dba_nqe: int = 0
    dba_alpha: float = 3.0


@dataclasses.dataclass(frozen=True)
class GradedConfig:
    name: str
    extract: ExtractConfig
    index: IndexConfig
    dataset: str
    note: str = ""


# The five graded benchmark configs (BASELINE.json:6-12).
GRADED_CONFIGS = {
    1: GradedConfig(
        name="r18-gem-oxford5k-subset",
        extract=ExtractConfig(model=ModelConfig(arch="resnet18"), image_size=362, scales=(1.0,)),
        index=IndexConfig(whitening=None),
        dataset="oxford5k-subset",
        note="CPU-runnable, single scale, brute-force kNN",
    ),
    2: GradedConfig(
        name="r50-gem-pca-roxford5k",
        extract=ExtractConfig(model=ModelConfig(arch="resnet50"), image_size=1024, scales=DEFAULT_SCALES),
        index=IndexConfig(whitening="pca"),
        dataset="roxford5k",
        note="multi-scale extraction, PCA whitening",
    ),
    3: GradedConfig(
        name="vgg16-netvlad-rparis6k",
        extract=ExtractConfig(
            model=ModelConfig(arch="vgg16", pooling="netvlad", use_pallas=True),
            image_size=1024,
        ),
        index=IndexConfig(whitening="pca", whiten_dims=4096),
        dataset="rparis6k",
        note="exercises the NetVLAD soft-assignment kernel",
    ),
    4: GradedConfig(
        name="r101-gem-100k-sharded",
        extract=ExtractConfig(model=ModelConfig(arch="resnet101", dtype="bfloat16"), image_size=1024),
        index=IndexConfig(whitening="pca"),
        dataset="roxford5k+100k",
        note="100k distractor gallery sharded across chips, distributed top-k",
    ),
    5: GradedConfig(
        name="aachen-1m-pod",
        extract=ExtractConfig(
            model=ModelConfig(arch="resnet101", dtype="bfloat16", use_pallas=True),
            image_size=1024,
        ),
        index=IndexConfig(whitening="pca"),
        dataset="aachen-day-night",
        note="1M-descriptor gallery, batched query streaming at pod scale",
    ),
}
