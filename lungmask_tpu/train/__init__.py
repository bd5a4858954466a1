from lungmask_tpu.train.trainer import (
    TrainState,
    cross_entropy_loss,
    dice_loss,
    init_train_state,
    make_train_step,
)

__all__ = [
    "TrainState",
    "cross_entropy_loss",
    "dice_loss",
    "init_train_state",
    "make_train_step",
]
