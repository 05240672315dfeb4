from image_retrieval_for_image_based_localization_tpu.data.images import (  # noqa: F401
    load_image,
    max_side_resize,
    normalize_images,
    bucket_shape,
    make_batches,
    ImageBatch,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
