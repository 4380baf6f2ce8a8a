from .losses import LossConfig, compute_losses
from .step import TrainStepConfig, build_train_step, build_eval_step, init_train_state

__all__ = [
    "LossConfig",
    "compute_losses",
    "TrainStepConfig",
    "build_train_step",
    "build_eval_step",
    "init_train_state",
]
