from .schedules import calc_learning_rate, warmup_learning_rate, lr_at_step
from .optim import make_optimizer, no_decay_mask
from .train_step import SRTrainer

__all__ = [
    "calc_learning_rate",
    "warmup_learning_rate",
    "lr_at_step",
    "make_optimizer",
    "no_decay_mask",
    "SRTrainer",
]
