"""Training: jitted step, optimizer/schedule, state, native checkpoints."""
from .checkpoint import latest_state_file, load_train_state, save_train_state
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
    "latest_state_file",
    "load_train_state",
    "save_train_state",
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "make_train_step",
    "multistep_lr",
    "task_loss_fn",
]
