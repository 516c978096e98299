"""Training: jitted step, optimizer/schedule, state, native checkpoints."""
from .checkpoint import CheckpointManager, latest_state_file, load_train_state, save_train_state
from .dsac_step import make_dsac_train_step
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
    "CheckpointManager",
    "latest_state_file",
    "load_train_state",
    "save_train_state",
    "make_dsac_train_step",
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "make_train_step",
    "multistep_lr",
    "task_loss_fn",
]
