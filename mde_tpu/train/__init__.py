from .optim import build_optimizer, onecycle_lr_schedule, onecycle_momentum_schedule
from .state import TrainState, create_train_state

__all__ = ["build_optimizer", "onecycle_lr_schedule", "onecycle_momentum_schedule",
           "TrainState", "create_train_state"]
