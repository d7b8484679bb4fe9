"""Training subsystem: loss phases, compiled step, state, stats, augment."""

from .loss import StyleGAN2Loss, StyleGAN2LossConfig
from .step import TrainStepConfig, TrainStepper
from .train_state import GANTrainState, create_train_state, lazy_reg_adam

__all__ = [
    "StyleGAN2Loss",
    "StyleGAN2LossConfig",
    "TrainStepConfig",
    "TrainStepper",
    "GANTrainState",
    "create_train_state",
    "lazy_reg_adam",
]
