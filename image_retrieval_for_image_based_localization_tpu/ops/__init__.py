"""Core descriptor ops: pooling, normalization, whitening, NetVLAD, losses.

Pure-functional jnp implementations are the source of truth; Pallas kernels
in ``ops.pallas`` are drop-in fused equivalents gated by equivalence tests.
"""

from image_retrieval_for_image_based_localization_tpu.ops.pooling import (  # noqa: F401
    mac,
    spoc,
    gem,
    rmac,
    rpool,
    POOLING_FNS,
)
from image_retrieval_for_image_based_localization_tpu.ops.normalization import (  # noqa: F401
    l2n,
)
from image_retrieval_for_image_based_localization_tpu.ops.whitening import (  # noqa: F401
    pca_whiten_learn,
    whiten_learn,
    whiten_apply,
)
from image_retrieval_for_image_based_localization_tpu.ops.netvlad import (  # noqa: F401
    netvlad_aggregate,
)
from image_retrieval_for_image_based_localization_tpu.ops.losses import (  # noqa: F401
    contrastive_loss,
    triplet_loss,
)
