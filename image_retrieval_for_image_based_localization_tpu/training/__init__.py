from image_retrieval_for_image_based_localization_tpu.training.trainer import (  # noqa: F401
    TrainConfig,
    create_train_state,
    make_train_step,
    make_eval_step,
    make_val_step,
    validate,
    train_epoch,
)
from image_retrieval_for_image_based_localization_tpu.training.mining import (  # noqa: F401
    mine_epoch_tuples,
    mine_hard_negatives,
    TupleSet,
)
