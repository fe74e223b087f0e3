from .step import (
    TRAINING_TYPES,
    TrainState,
    init_train_state,
    make_optimizer,
    make_train_step,
    trainable_mask,
    update_ema,
)

__all__ = [
    "TRAINING_TYPES", "TrainState", "init_train_state", "make_optimizer",
    "make_train_step", "trainable_mask", "update_ema",
]
