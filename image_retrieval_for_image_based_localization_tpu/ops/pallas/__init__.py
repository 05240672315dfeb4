"""Pallas TPU kernels for the descriptor hot path.

Each kernel is a drop-in fused equivalent of a jnp oracle in ``ops`` and is
gated by an equivalence test (tests/test_pallas_kernels.py). On non-TPU
backends the kernels run in interpreter mode so the full suite stays
CPU-runnable.
"""

from image_retrieval_for_image_based_localization_tpu.ops.pallas.gem_l2n import (  # noqa: F401
    gem_l2n_fused,
    gem_l2n_fused_rect,
)
from image_retrieval_for_image_based_localization_tpu.ops.pallas.netvlad_kernel import (  # noqa: F401
    netvlad_fused,
    netvlad_fused_rect,
)
from image_retrieval_for_image_based_localization_tpu.ops.pallas.score_topk import (  # noqa: F401
    scores_blockmax,
    pallas_topk_search,
)
