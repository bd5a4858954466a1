from lungmask_tpu.train.augment import Augmenter
from lungmask_tpu.train.loop import FitResult, default_optimizer, evaluate, fit
from lungmask_tpu.train.trainer import (
    TrainState,
    cross_entropy_loss,
    dice_loss,
    init_train_state,
    make_train_step,
)

__all__ = [
    "Augmenter",
    "FitResult",
    "TrainState",
    "cross_entropy_loss",
    "default_optimizer",
    "dice_loss",
    "evaluate",
    "fit",
    "init_train_state",
    "make_train_step",
]
