"""TPU-native image-retrieval framework for image-based localization.

A brand-new JAX/XLA/Pallas re-design of the capabilities of the PyTorch
reference ``Tarekbouamer/Image-Retrieval-for-Image-Based-Localization``
(cirtorch lineage; the read-only reference mount was empty at survey time —
see SURVEY.md §0 — so behavior is reconstructed from the documented
capability contract in BASELINE.json and the upstream cirtorch lineage).

Public API (mirrors the reference's entry points, BASELINE.json:5):

    extract_features(images | paths, cfg)  -> [N, D] descriptors
    build_index(descriptors, cfg)          -> Index (whitening + gallery)
    query(index, qdescriptors, k)          -> (scores, indices)

Layout conventions (TPU-native, deliberately not the reference's):
  * images are NHWC float32/bfloat16;
  * descriptors are row-major [N, D] (the reference returns D x N);
  * all device code is jit-compatible with static shapes (bucketed resize).
"""

__version__ = "0.1.0"

from image_retrieval_for_image_based_localization_tpu.api import (  # noqa: F401
    extract_features,
    build_index,
    query,
    Extractor,
)
from image_retrieval_for_image_based_localization_tpu.utils.config import (  # noqa: F401
    ExtractConfig,
    IndexConfig,
    ModelConfig,
    GRADED_CONFIGS,
)
