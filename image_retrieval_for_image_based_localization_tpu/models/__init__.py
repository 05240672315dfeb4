from image_retrieval_for_image_based_localization_tpu.models.resnet import (  # noqa: F401
    ResNetTrunk,
    RESNET_SPECS,
)
from image_retrieval_for_image_based_localization_tpu.models.vgg import (  # noqa: F401
    VGGTrunk,
)
from image_retrieval_for_image_based_localization_tpu.models.retrieval_net import (  # noqa: F401
    RetrievalNet,
    create_model,
    OUTPUT_DIM,
)
