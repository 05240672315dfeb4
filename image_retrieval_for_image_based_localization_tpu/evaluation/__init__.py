from image_retrieval_for_image_based_localization_tpu.evaluation.map import (  # noqa: F401
    compute_ap,
    compute_map,
    compute_map_revisited,
    compute_map_and_print,
)
from image_retrieval_for_image_based_localization_tpu.evaluation.harness import (  # noqa: F401
    evaluate_dataset,
)
