"""Training: jitted steps, optimizer, loop, checkpointing."""

from tdnet.train.step import (
    TrainState,
    create_optimizer,
    create_train_state,
    make_eval_step,
    make_train_step,
)

__all__ = [
    "TrainState",
    "create_optimizer",
    "create_train_state",
    "make_eval_step",
    "make_train_step",
]
