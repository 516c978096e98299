"""Training: jitted step, optimizer/schedule, state."""
from .step import (
    TrainBatch,
    TrainState,
    create_train_state,
    make_optimizer,
    make_train_step,
    multistep_lr,
    task_loss_fn,
)

__all__ = [
    "TrainBatch",
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "make_train_step",
    "multistep_lr",
    "task_loss_fn",
]
