from .loss import MAX_FLOW, uniform_sequence_loss
from .optim import make_optimizer, one_cycle_linear
from .trainer import Trainer, TrainerConfig, TrainState, make_train_step

__all__ = [
    "MAX_FLOW",
    "uniform_sequence_loss",
    "make_optimizer",
    "one_cycle_linear",
    "Trainer",
    "TrainerConfig",
    "TrainState",
    "make_train_step",
]
