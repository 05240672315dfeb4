from image_retrieval_for_image_based_localization_tpu.retrieval.knn import (  # noqa: F401
    approx_topk,
    knn_search,
    score_matrix,
    full_ranks,
)
from image_retrieval_for_image_based_localization_tpu.retrieval.index import (  # noqa: F401
    Index,
)
