from molecular_dynamics_neural_operator_tpu.train.state import TrainState, create_train_state
from molecular_dynamics_neural_operator_tpu.train.optim import make_optimizer, step_lr_schedule
from molecular_dynamics_neural_operator_tpu.train.split import train_valid_split
from molecular_dynamics_neural_operator_tpu.train.loop import (
    make_train_step,
    make_eval_step,
    featurize_batch,
    train_epoch,
    eval_epoch,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "step_lr_schedule",
    "train_valid_split",
    "make_train_step",
    "make_eval_step",
    "featurize_batch",
    "train_epoch",
    "eval_epoch",
]
